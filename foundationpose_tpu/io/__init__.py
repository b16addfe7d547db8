from foundationpose_tpu.io import datareader, file_loader, nt, pose6d  # noqa: F401

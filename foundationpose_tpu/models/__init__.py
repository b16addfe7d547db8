from foundationpose_tpu.models import layers, refine_net, score_net  # noqa: F401

"""One typed configuration tree with YAML load/save.

The reference mixes three config mechanisms — OmegaConf YAML shipped with
weights (predict_pose_refine.py:102-132), plain YAML mutated at runtime
(bundlesdf/config_ycbv.yml via run_nerf.py:80-95), and argparse flags
(readme.md:89-120). Here every subsystem's config is a frozen dataclass
(RefinerConfig, ScorerConfig, EstimatorConfig, FieldConfig, ...) and this
module provides generic YAML <-> dataclass conversion with explicit
precedence: defaults < YAML file < overrides dict.

Reference-style BundleSDF YAML keys (config_ycbv.yml) are accepted through a
key-translation table so existing configs port directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Type, TypeVar

T = TypeVar("T")

# reference config_ycbv.yml keys -> FieldConfig field names
_FIELD_KEY_MAP = {
    "n_step": "n_step",
    "N_rand": "n_rand",
    "lrate": "lrate",
    "lrate_pose": "lrate_pose",
    "decay_rate": "decay_rate",
    "N_samples": "n_samples",
    "N_samples_around_depth": "n_samples_around_depth",
    "trunc": "trunc",
    "sdf_lambda": "sdf_lambda",
    "neg_trunc_ratio": "neg_trunc_ratio",
    "fs_sdf": "fs_sdf",
    "near": "near",
    "far": "far",
    "rgb_weight": "rgb_weight",
    "fs_weight": "fs_weight",
    "empty_weight": "empty_weight",
    "trunc_weight": "trunc_weight",
    "feature_reg_weight": "feature_reg_weight",
    "pose_reg_weight": "pose_reg_weight",
    "first_frame_weight": "first_frame_weight",
    "frame_features": "frame_features",
    "optimize_poses": "optimize_poses",
    "max_trans": "max_trans",
    "max_rot": "max_rot",
    "num_levels": "num_levels",
    "log2_hashmap_size": "log2_hashmap_size",
    "base_res": "base_res",
    "finest_res": "finest_res",
    "feature_grid_dim": "feature_grid_dim",
    "multires_views": "sh_degree",
    "mesh_resolution": "mesh_resolution",
    "dilate_mask_size": "mask_dilate",
    "rays_valid_depth_only": "rays_valid_depth_only",
}


def from_dict(cls: Type[T], data: dict, key_map: dict | None = None) -> T:
    """Build a dataclass from a dict, ignoring unknown keys, recursing into
    dataclass-typed fields."""
    if key_map:
        data = {key_map[k]: v for k, v in data.items() if k in key_map} | {
            k: v for k, v in data.items() if k in {f.name for f in dataclasses.fields(cls)}
        }
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            continue
        f = fields[k]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            kwargs[k] = from_dict(f.type, v)
        elif isinstance(v, list) and isinstance(f.default, tuple):
            # YAML has no tuple type; restore tuple-typed fields on load
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def load_yaml(cls: Type[T], path: str, overrides: dict | None = None,
              key_map: dict | None = None) -> T:
    """defaults < YAML < overrides."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    if overrides:
        data.update(overrides)
    return from_dict(cls, data, key_map=key_map)


def save_yaml(cfg, path: str):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def load_field_config(path: str, overrides: dict | None = None):
    """Load a FieldConfig from our YAML or a reference-style BundleSDF YAML
    (config_ycbv.yml keys translated)."""
    from foundationpose_tpu.field.runner import FieldConfig

    return load_yaml(FieldConfig, path, overrides=overrides, key_map=_FIELD_KEY_MAP)

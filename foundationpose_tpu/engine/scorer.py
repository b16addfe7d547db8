"""Hypothesis scoring.

Jitted equivalent of the reference ScorePredictor.predict
(predict_score.py:160-226). The reference's hierarchical "tournament"
degenerates to a single cross-pose-attention forward over all L hypotheses
(its chunk size is the full batch, predict_score.py:186-213, so the loop
exits after one round with +100 added to the surviving scores); we implement
exactly that single forward.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from foundationpose_tpu.engine.crop import make_crop_batch
from foundationpose_tpu.models.score_net import ScoreNetMultiPair


@dataclasses.dataclass(frozen=True)
class ScorerConfig:
    normalize_xyz: bool = True
    crop_ratio: float = 1.2
    input_size: int = 160
    c_in: int = 6
    norm: str | None = None
    dtype: str = "bfloat16"
    # residual attention wrappers for synthetically-trained nets (see
    # ScoreNetMultiPair.residual_attn); False = exact reference forward for
    # imported checkpoints
    residual_attn: bool = False
    # raster backend: None = auto (Pallas on TPU, XLA elsewhere)
    use_pallas: bool | None = None
    # exact for closed CCW meshes; the estimator auto-enables it when the
    # mesh is watertight (halves rasterizer work)
    backface_cull: bool = False


class PoseScorer:
    def __init__(self, config: ScorerConfig = ScorerConfig(), params=None, seed=0):
        if config.use_pallas is None:
            config = dataclasses.replace(
                config, use_pallas=jax.default_backend() != "cpu"
            )
        self.cfg = config
        self.net = ScoreNetMultiPair(
            c_in=config.c_in,
            norm=config.norm,
            dtype=jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32,
            residual_attn=config.residual_attn,
        )
        if params is None:
            dummy = jnp.zeros((2, config.input_size, config.input_size, config.c_in))
            params = self.net.init(jax.random.PRNGKey(seed), dummy, dummy, 2)
        self.params = params

    def predict(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter):
        """poses: (N,4,4) -> scores (N,)."""
        return _score_jit(
            self.net,
            self.cfg,
            self.params,
            mesh_tensors,
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(rgb, jnp.float32),
            jnp.asarray(xyz_map, jnp.float32),
            float(mesh_diameter),
        )

    def traced_score(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter,
                     out_size=None):
        """Traceable body for fusing into a larger jitted program.
        ``out_size`` overrides the crop resolution (see
        PoseRefiner.traced_refine)."""
        return _score_jit(self.net, self.cfg, self.params, mesh_tensors, poses,
                          K, rgb, xyz_map, mesh_diameter, out_size)

    # -- shared fused-program protocol (see PoseRefiner.program_key) --
    @property
    def program_key(self):
        return (PoseScorer, self.net, self.cfg)

    @property
    def program_params(self):
        return self.params

    @staticmethod
    def traced_body_fn(key):
        _, net, cfg = key

        def fn(params, mesh_tensors, rgb, xyz_map, K, poses, diameter,
               out_size=None, gate_px=0):
            return _score_jit(net, cfg, params, mesh_tensors, poses, K, rgb,
                              xyz_map, diameter, out_size, gate_px)

        return fn


@functools.partial(
    jax.jit, static_argnames=("net", "cfg", "out_size", "gate_px")
)
def _score_jit(net, cfg, params, mesh_tensors, poses, K, rgb, xyz_map,
               mesh_diameter, out_size=None, gate_px=0):
    data = make_crop_batch(
        mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
        crop_ratio=cfg.crop_ratio, out_size=int(out_size or cfg.input_size),
        normalize_xyz=cfg.normalize_xyz,
        z_invalid_thres=0.1,  # TripletH5Dataset semantics (h5_dataset.py:151)
        use_pallas=bool(cfg.use_pallas), backface_cull=cfg.backface_cull,
        gate_px=int(gate_px),
    )
    out = net.apply(params, data["inputA"], data["inputB"], poses.shape[0])
    return out["score_logit"].reshape(-1)


class HybridScorer:
    """ScoreNet ranking + geometric depth-consistency veto.

    The synthetically-trained ScoreNet separates fine pose basins extremely
    well on clean scenes but can rank a distractor-aligned hypothesis above
    the true pose under clutter/occlusion (the measured r5 failure: clutter
    scenes 0.0-0.39 register AUC while the 9 clean scenes sit at
    0.89-0.98). The geometric score (engine.geometric._geo_score:
    depth-consistency + normal agreement + silhouette-edge alignment) is
    immune to exactly that: a wrong-object hypothesis renders where the
    observation has different depth and loses ~3 score units. The hybrid
    adds ``weight x geo_score`` to the net logit — geometric veto on gross
    wrong-basins, ScoreNet on fine ranking. Same fused-program protocol as
    PoseScorer, so it drops into register AND multi-hypothesis tracking.
    """

    def __init__(self, learned: PoseScorer, geo_config=None, weight=2.0):
        from foundationpose_tpu.engine.geometric import GeometricConfig

        self.learned = learned
        self.geo_cfg = geo_config or GeometricConfig(
            input_size=learned.cfg.input_size,
            use_pallas=learned.cfg.use_pallas,
            backface_cull=learned.cfg.backface_cull,
        )
        self.weight = float(weight)

    # the estimator flips backface culling via dataclasses.replace on .cfg;
    # expose the learned scorer's cfg and mirror changes into the geo cfg
    @property
    def cfg(self):
        return self.learned.cfg

    @cfg.setter
    def cfg(self, value):
        import dataclasses

        self.learned.cfg = value
        self.geo_cfg = dataclasses.replace(
            self.geo_cfg, use_pallas=value.use_pallas,
            backface_cull=value.backface_cull,
        )

    @property
    def params(self):
        return self.learned.params

    @params.setter
    def params(self, value):
        self.learned.params = value

    def predict(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter):
        import jax.numpy as jnp

        from foundationpose_tpu.engine.geometric import _geo_score

        s = self.learned.predict(mesh_tensors, rgb, xyz_map, K, poses,
                                 mesh_diameter)
        g = _geo_score(self.geo_cfg, mesh_tensors,
                       jnp.asarray(poses, jnp.float32),
                       jnp.asarray(K, jnp.float32),
                       jnp.asarray(rgb, jnp.float32),
                       jnp.asarray(xyz_map, jnp.float32),
                       float(mesh_diameter))
        return s + self.weight * g

    # -- shared fused-program protocol --
    @property
    def program_key(self):
        return (HybridScorer, self.learned.net, self.learned.cfg,
                self.geo_cfg, self.weight)

    @property
    def program_params(self):
        return self.learned.params

    @staticmethod
    def traced_body_fn(key):
        from foundationpose_tpu.engine.geometric import _geo_score

        _, net, cfg, geo_cfg, weight = key

        def fn(params, mesh_tensors, rgb, xyz_map, K, poses, diameter,
               out_size=None, gate_px=0):
            s = _score_jit(net, cfg, params, mesh_tensors, poses, K, rgb,
                           xyz_map, diameter, out_size, gate_px)
            g = _geo_score(geo_cfg, mesh_tensors, poses, K, rgb, xyz_map,
                           diameter, gate_px=gate_px)
            return s + weight * g

        return fn

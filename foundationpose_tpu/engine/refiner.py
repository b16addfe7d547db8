"""Iterative render-and-compare pose refinement.

Jitted equivalent of the reference PoseRefinePredictor.predict
(predict_pose_refine.py:149-295): for each of ``iteration`` rounds, render all
hypotheses into crops, run RefineNet on [rendered | observed] 6-channel
inputs, decode the predicted delta (tracknet/tanh translation, axis-angle or
6d rotation, both bounded by normalizers), and apply it egocentrically.

The whole iteration loop is one compiled XLA program (lax.scan-free python
loop under jit with a static iteration count); no 512/1024-chunking — the
hypothesis axis is the batch axis and shards across the device mesh.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.engine.crop import make_crop_batch
from foundationpose_tpu.models.refine_net import RefineNet


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    """Decode configuration (reference cfg defaults, predict_pose_refine.py:107-131
    + the released-weights convention of normalize_xyz inputs)."""

    rot_rep: str = "axis_angle"  # or '6d'
    trans_rep: str = "tracknet"
    normalize_xyz: bool = True
    trans_normalizer: tuple = (0.019999999552965164,) * 3
    rot_normalizer: float = 0.3490658503988659  # 20 deg in rad
    crop_ratio: float = 1.2
    input_size: int = 160
    c_in: int = 6
    norm: str | None = None
    dtype: str = "bfloat16"
    # raster backend: None = auto (Pallas on TPU, XLA elsewhere)
    use_pallas: bool | None = None
    # exact for closed CCW meshes; the estimator auto-enables it when the
    # mesh is watertight (halves rasterizer work)
    backface_cull: bool = False


class PoseRefiner:
    def __init__(self, config: RefinerConfig = RefinerConfig(), params=None, seed=0):
        if config.use_pallas is None:
            config = dataclasses.replace(
                config, use_pallas=jax.default_backend() != "cpu"
            )
        self.cfg = config
        self.net = RefineNet(
            c_in=config.c_in,
            rot_rep=config.rot_rep,
            norm=config.norm,
            dtype=jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32,
        )
        if params is None:
            dummy = jnp.zeros((1, config.input_size, config.input_size, config.c_in))
            params = self.net.init(jax.random.PRNGKey(seed), dummy, dummy)
        self.params = params
        self._predict = functools.partial(
            _refine_iters,
            net=self.net,
            cfg=self.cfg,
        )

    def predict(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter, iteration=5):
        """poses: (N,4,4) -> refined (N,4,4). All-device computation."""
        return _refine_jit(
            self.net,
            self.cfg,
            self.params,
            mesh_tensors,
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(rgb, jnp.float32),
            jnp.asarray(xyz_map, jnp.float32),
            float(mesh_diameter),
            int(iteration),
        )

    def traced_refine(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter,
                      iteration, out_size=None):
        """Traceable body for fusing into a larger jitted program (the
        estimator's single-dispatch register/track). ``out_size`` overrides
        the crop resolution (the conv weights are resolution-independent and
        the positional table slices to the token count, so a coarse funnel
        pass can run the same weights on smaller crops)."""
        return _refine_iters(self.params, mesh_tensors, poses, K, rgb, xyz_map,
                             mesh_diameter, int(iteration), net=self.net,
                             cfg=self.cfg, out_size=out_size)

    # -- shared fused-program protocol (engine.estimator._register_program):
    # program_key is a hashable static key (flax modules hash by config, so
    # two PoseRefiners with equal configs share one compiled program);
    # program_params is the traced pytree; traced_body_fn rebuilds the
    # traceable refine body from the key alone.
    @property
    def program_key(self):
        return (PoseRefiner, self.net, self.cfg)

    @property
    def program_params(self):
        return self.params

    @staticmethod
    def traced_body_fn(key):
        _, net, cfg = key

        def fn(params, mesh_tensors, rgb, xyz_map, K, poses, diameter,
               iteration, out_size=None, gate_px=0):
            return _refine_iters(params, mesh_tensors, poses, K, rgb, xyz_map,
                                 diameter, int(iteration), net=net, cfg=cfg,
                                 out_size=out_size, gate_px=gate_px)

        return fn


@functools.partial(jax.jit, static_argnames=("net", "cfg", "iteration"))
def _refine_jit(net, cfg, params, mesh_tensors, poses, K, rgb, xyz_map,
                mesh_diameter, iteration):
    return _refine_iters(params, mesh_tensors, poses, K, rgb, xyz_map,
                         mesh_diameter, iteration, net=net, cfg=cfg)


def _refine_iters(params, mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
                  iteration, *, net, cfg: RefinerConfig, out_size=None,
                  gate_px=0):
    # fori_loop (not python unroll): the refine body — render + crop + net —
    # is traced once regardless of the iteration count, keeping compile time
    # and HLO size flat.
    return jax.lax.fori_loop(
        0,
        iteration,
        lambda _, p: refine_once(
            params, mesh_tensors, p, K, rgb, xyz_map, mesh_diameter,
            net=net, cfg=cfg, out_size=out_size, gate_px=gate_px,
        ),
        poses,
    )


def refine_once(params, mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
                *, net, cfg: RefinerConfig, out_size=None, gate_px=0):
    data = make_crop_batch(
        mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
        crop_ratio=cfg.crop_ratio, out_size=int(out_size or cfg.input_size),
        normalize_xyz=cfg.normalize_xyz, z_invalid_thres=0.001,
        use_pallas=bool(cfg.use_pallas), backface_cull=cfg.backface_cull,
        gate_px=int(gate_px),
    )
    out = net.apply(params, data["inputA"], data["inputB"])
    trans_delta, rot_mat_delta = decode_delta(
        out, cfg, mesh_diameter,
        poses=poses, K=K, tf_to_crops=data["tf_to_crops"],
        input_size=int(out_size or cfg.input_size),
    )
    return geo.egocentric_delta_pose_to_pose(poses, trans_delta, rot_mat_delta)


def _deepim_trans_delta(out_trans, poses, K, tf_to_crops, input_size):
    """DeepIM-style translation decode (predict_pose_refine.py:201-218):
    the net predicts a crop-space uv offset (in units of the crop width) and
    a relative depth; unproject through the crop transform and K to get the
    camera-space center delta."""
    t = poses[:, :3, 3]  # (N,3)
    z_pred = out_trans[:, 2] * t[:, 2]
    # project hypothesis center into crop pixel space
    uv = jnp.einsum("ij,nj->ni", K, t)
    uv = uv / uv[:, 2:3]
    uv_crop = jnp.einsum("nij,nj->ni", tf_to_crops, uv)[:, :2]
    uv_pred_crop = uv_crop + out_trans[:, :2] * input_size
    # back to image pixels, then unproject at the predicted depth
    inv_tf = jnp.linalg.inv(tf_to_crops)
    ones = jnp.ones((out_trans.shape[0], 1), jnp.float32)
    uv_pred = jnp.einsum(
        "nij,nj->ni", inv_tf, jnp.concatenate([uv_pred_crop, ones], axis=-1)
    )[:, :2]
    ray = jnp.einsum(
        "ij,nj->ni", jnp.linalg.inv(K), jnp.concatenate([uv_pred, ones], axis=-1)
    )
    center_pred = ray * z_pred[:, None]
    return center_pred - t


def decode_delta(out, cfg: RefinerConfig, mesh_diameter, *, poses=None, K=None,
                 tf_to_crops=None, input_size=None):
    """Delta decoding rules of predict_pose_refine.py:195-231."""
    if cfg.trans_rep == "tracknet":
        if cfg.normalize_xyz:
            trans_delta = out["trans"] * (mesh_diameter / 2.0)
        else:
            tn = jnp.asarray(cfg.trans_normalizer, jnp.float32).reshape(1, 3)
            trans_delta = jnp.tanh(out["trans"]) * tn
    elif cfg.trans_rep == "deepim":
        trans_delta = _deepim_trans_delta(
            out["trans"], poses, K, tf_to_crops,
            input_size if input_size is not None else cfg.input_size,
        )
        if cfg.normalize_xyz:
            # the reference applies the diameter scaling to ALL trans reps
            # (predict_pose_refine.py:228-229), deepim included; mirrored for
            # checkpoint parity even though the deepim delta is already metric
            trans_delta = trans_delta * (mesh_diameter / 2.0)
    else:
        raise ValueError(cfg.trans_rep)

    if cfg.rot_rep == "axis_angle":
        rot_mat_delta = geo.so3_exp_map(
            jnp.tanh(out["rot"]) * cfg.rot_normalizer
        ).transpose(0, 2, 1)
    elif cfg.rot_rep == "6d":
        rot_mat_delta = geo.rotation_6d_to_matrix(out["rot"]).transpose(0, 2, 1)
    else:
        raise ValueError(cfg.rot_rep)
    return trans_delta, rot_mat_delta

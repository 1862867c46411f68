"""bf16 association scoring (ba.py assoc_dtype="bf16"): the candidate
windows are gathered and scored in bfloat16 (half the slice bytes), then
the SELECTED candidate is re-fetched in f32. Only near-tie argmin picks
may differ from the f32 search, so (a) the found-set and picks must agree
almost everywhere at refine-regime poses, and (b) the full BA must land
on the same poses as the f32 schedule on a real perturbed problem."""
import jax.numpy as jnp
import numpy as np

from test_assoc_projective import _maps, _run_mode_cfg
from test_ba_early_out import _build  # noqa: F401 (re-exported pattern)

from bundlesdf_tpu.tracker.ba import BAConfig, _dense_associate


def test_bf16_association_matches_f32():
    seq, xyz, nrm, valid = _maps()
    K = jnp.asarray(seq["K"], jnp.float32)
    poses = jnp.asarray(seq["cam_in_obs"], jnp.float32)
    D = 256
    src_idx = np.zeros((2, D), np.int64)
    src_valid = np.zeros((2, D), bool)
    for i in range(2):
        flat = np.flatnonzero(valid[i].reshape(-1))
        take = flat[:: max(len(flat) // D, 1)][:D]
        src_idx[i, : len(take)] = take
        src_valid[i, : len(take)] = True
    pair_ij = jnp.asarray([[0, 1]], jnp.int32)
    outs = {}
    for dt in ("f32", "bf16"):
        cfg = BAConfig(dense_dist_thres=0.02, dense_normal_thres_deg=45,
                       assoc_dtype=dt)
        outs[dt] = _dense_associate(
            poses, jnp.asarray(xyz), jnp.asarray(nrm), K, pair_ij,
            jnp.asarray(src_idx), jnp.asarray(src_valid), cfg,
            cfg.assoc_radius_refine)
    f32_f = np.asarray(outs["f32"]["found"][0])
    b16_f = np.asarray(outs["bf16"]["found"][0])
    # found-sets agree except for borderline-gate candidates
    assert (f32_f ^ b16_f).sum() <= max(2, 0.05 * f32_f.sum())
    both = f32_f & b16_f
    p32 = np.asarray(outs["f32"]["tgt_p"][0])[both]
    p16 = np.asarray(outs["bf16"]["tgt_p"][0])[both]
    # the bf16 pick is a REAL f32 map value (re-fetched), and almost all
    # picks are the identical candidate
    d = np.linalg.norm(p32 - p16, axis=-1)
    assert (d == 0).mean() > 0.9
    assert np.median(d) == 0.0
    # where the pick differs (near-tie), it stays within the dist gate
    assert d.max() <= 2 * 0.02


def test_ba_bf16_matches_f32_poses():
    poses_a = _run_mode_cfg({"assoc_dtype": "f32"})
    poses_b = _run_mode_cfg({"assoc_dtype": "bf16"})
    dt = np.abs(poses_a[:, :3, 3] - poses_b[:, :3, 3]).max()
    dR = np.abs(poses_a[:, :3, :3] - poses_b[:, :3, :3]).max()
    assert dt < 1e-3, dt
    assert dR < 1e-2, dR

"""Progressive distillation (training/distill.py): target algebra is an
exact DDIM inverse, stage grids align with the sampler's, and the full
cascade trains, checkpoints, and produces a student the standard transfer
path can run at the distilled step count."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.diffusion.ddim import transfer_time_grid
from music_style_transfer_ldm_tpu.models.ldm import (
    LDM, content_style_transfer,
)
from music_style_transfer_ldm_tpu.parallel import make_mesh
from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib
from music_style_transfer_ldm_tpu.training.distill import (
    ProgressiveDistiller, ddim_step, distill_stage_grids, solve_x0_target,
)


def tiny_config():
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=8,
                                    compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    return cfg


def test_solve_x0_target_inverts_ddim(rng):
    """For any (z_t, z_ss) pair, one DDIM step from z_t with the epsilon
    implied by the solved x0 target lands exactly on z_ss."""
    z_t = jnp.asarray(rng.randn(4, 8, 8, 2).astype(np.float32))
    z_ss = jnp.asarray(rng.randn(4, 8, 8, 2).astype(np.float32))
    ab_t = jnp.asarray(rng.uniform(0.05, 0.6, (4, 1, 1, 1))
                       .astype(np.float32))
    # s < t in the denoising walk means LESS noise: ab_s > ab_t.
    ab_s = ab_t + jnp.asarray(rng.uniform(0.05, 0.3, (4, 1, 1, 1))
                              .astype(np.float32))
    x0 = solve_x0_target(z_t, z_ss, ab_t, ab_s)
    eps = (z_t - jnp.sqrt(ab_t) * x0) / jnp.sqrt(1.0 - ab_t)
    z_back = ddim_step(z_t, eps, ab_t, ab_s)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z_ss),
                               atol=1e-5)


def test_ddim_step_matches_sampler_update():
    """ddim_step reproduces diffusion/ddim.py's eta=0 update bit-for-bit
    on a real schedule (shared-formula guard)."""
    from music_style_transfer_ldm_tpu.diffusion.ddim import ddim_sample
    from music_style_transfer_ldm_tpu.diffusion.schedule import (
        DiffusionSchedule,
    )
    sched = DiffusionSchedule.create(200)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3)
                    .astype(np.float32))
    eps_const = jnp.full_like(z, 0.37)
    times = jnp.asarray([90, 60, 30], jnp.int32)
    out, _ = ddim_sample(lambda x, t: eps_const, sched, z, times)
    x = z
    for t, s in [(90, 60), (60, 30)]:
        x = ddim_step(x, eps_const, sched.alpha_bars[t],
                      sched.alpha_bars[s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_distill_stage_grids_align():
    teacher, student = distill_stage_grids(100, 96)
    assert len(teacher) == 97 and len(student) == 49
    np.testing.assert_array_equal(student, teacher[::2])
    # The student grid IS the sampler's grid at steps = n//2 + 1, so a
    # distilled student runs through the stock transfer path.
    np.testing.assert_array_equal(student, transfer_time_grid(100, 49))
    with pytest.raises(ValueError, match="divisible"):
        distill_stage_grids(100, 7)


def test_distill_stage_grids_factor_k():
    """A factor-k stage (the final 3 -> 1 collapse) still aligns with the
    stock sampler grid: the student grid is exactly the endpoints."""
    teacher, student = distill_stage_grids(50, 3, factor=3)
    assert len(teacher) == 4 and len(student) == 2
    np.testing.assert_array_equal(student, teacher[::3])
    np.testing.assert_array_equal(student, transfer_time_grid(50, 2))
    with pytest.raises(ValueError, match="divisible"):
        distill_stage_grids(50, 4, factor=3)
    with pytest.raises(ValueError, match="factor"):
        distill_stage_grids(50, 4, factor=1)


def test_progressive_distill_cascade(tmp_path, rng):
    """Two halving stages on a fresh tiny model: loss is finite and
    decreases within a stage, only the UNet subtree changes, per-stage
    checkpoints load back, and the final student runs through the stock
    transfer path at its distilled step count."""
    cfg = tiny_config()
    mesh = make_mesh((-1, 1))
    dist = ProgressiveDistiller(cfg, mesh=mesh, t_max=100)

    S = cfg.model.image_size
    x = jnp.zeros((1, S, S, 1))
    variables = dist.model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    def batch():
        c = rng.rand(8, S, S, 1).astype(np.float32)
        s = rng.rand(8, S, S, 1).astype(np.float32)
        return ((c, [0] * 8), (s, [0] * 8))

    loader = [batch() for _ in range(2)]
    out, info = dist.distill(variables, loader, stages=(4, 2),
                             steps_per_stage=24, lr=1e-3,
                             out_dir=tmp_path, seed=0)

    assert info["steps"] == 1 and info["stages"] == [4, 2]
    for st in info["history"]:
        assert np.isfinite(st["loss_head"]) and np.isfinite(st["loss_tail"])
    # Distillation should make clear progress from a random student even
    # in a handful of steps (the target is a smooth function of the
    # teacher the student starts equal to only on the FINE grid).
    assert info["history"][0]["loss_tail"] < info["history"][0]["loss_head"]

    # Frozen subtrees are bit-identical; the UNet moved.
    for comp in ("encoder", "decoder", "style_encoder"):
        before = jax.tree_util.tree_leaves(variables["params"][comp])
        after = jax.tree_util.tree_leaves(out["params"][comp])
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(
                 jax.tree_util.tree_leaves(variables["params"]["unet"]),
                 jax.tree_util.tree_leaves(out["params"]["unet"]))]
    assert any(moved)

    # Per-stage checkpoints exist and carry metadata.
    for n in (2, 1):
        payload = ckpt_lib.restore_pytree(tmp_path / f"distilled_{n}")
        assert payload["distill"]["steps"] == n
        assert payload["distill"]["t_max"] == 100

    # The final student samples through the UNCHANGED product path on its
    # own grid: steps = distilled_steps + 1 grid points.
    content = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    decoded, z_t_dec, _ = content_style_transfer(
        dist.model, out, jax.random.PRNGKey(3), content, style,
        num_timesteps=100, steps=info["steps"] + 1)
    assert decoded.shape == (2, S, S, 1)
    assert np.all(np.isfinite(np.asarray(decoded)))


def test_distill_final_factor_stage_to_one_step(tmp_path, rng):
    """An odd final stage collapses to a ONE-step student (factor = the
    whole teacher count): 3 -> 1, where halving cannot go.  The stage
    trains, checkpoints with the right metadata, and the 1-step student
    runs through the stock transfer path at steps=2."""
    cfg = tiny_config()
    mesh = make_mesh((-1, 1))
    dist = ProgressiveDistiller(cfg, mesh=mesh, t_max=100)

    S = cfg.model.image_size
    x = jnp.zeros((1, S, S, 1))
    variables = dist.model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    def batch():
        c = rng.rand(8, S, S, 1).astype(np.float32)
        s = rng.rand(8, S, S, 1).astype(np.float32)
        return ((c, [0] * 8), (s, [0] * 8))

    loader = [batch() for _ in range(2)]
    out, info = dist.distill(variables, loader, stages=(3,),
                             steps_per_stage=8, lr=1e-3,
                             out_dir=tmp_path, seed=0)
    assert info["steps"] == 1 and info["stages"] == [3]
    payload = ckpt_lib.restore_pytree(tmp_path / "distilled_1")
    assert payload["distill"]["steps"] == 1

    content = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    decoded, _, _ = content_style_transfer(
        dist.model, out, jax.random.PRNGKey(3), content, style,
        num_timesteps=100, steps=2)
    assert decoded.shape == (2, S, S, 1)
    assert np.all(np.isfinite(np.asarray(decoded)))

    # Invalid cascades are rejected: non-integer factor.
    with pytest.raises(ValueError, match="factor"):
        dist.distill(variables, loader, stages=(4, 3), steps_per_stage=1,
                     out_dir=tmp_path / "bad")


def test_distill_guided_teacher(tmp_path, rng):
    """guidance != 1 distills the CFG-combined teacher: the stage trains
    to finite losses, guidance is recorded in the checkpoint metadata, and
    the guided student genuinely differs from the unguided one distilled
    from the same seed (the teacher targets differ)."""
    cfg = tiny_config()
    mesh = make_mesh((-1, 1))
    dist = ProgressiveDistiller(cfg, mesh=mesh, t_max=100)

    S = cfg.model.image_size
    x = jnp.zeros((1, S, S, 1))
    variables = dist.model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    def batch():
        c = rng.rand(8, S, S, 1).astype(np.float32)
        s = rng.rand(8, S, S, 1).astype(np.float32)
        return ((c, [0] * 8), (s, [0] * 8))

    loader = [batch()]
    out_g, info_g = dist.distill(variables, loader, stages=(2,),
                                 steps_per_stage=4, lr=1e-3,
                                 out_dir=tmp_path / "g", seed=0,
                                 guidance=2.5)
    out_p, _ = dist.distill(variables, loader, stages=(2,),
                            steps_per_stage=4, lr=1e-3,
                            out_dir=tmp_path / "p", seed=0, guidance=1.0)

    assert info_g["guidance"] == 2.5
    assert np.isfinite(info_g["history"][0]["loss_tail"])
    payload = ckpt_lib.restore_pytree(tmp_path / "g" / "distilled_1")
    assert payload["distill"]["guidance"] == 2.5

    g_leaves = jax.tree_util.tree_leaves(out_g["params"]["unet"])
    p_leaves = jax.tree_util.tree_leaves(out_p["params"]["unet"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(g_leaves, p_leaves))

    # The guided student samples UNGUIDED through the stock path.
    content = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32))
    decoded, _, _ = content_style_transfer(
        dist.model, out_g, jax.random.PRNGKey(3), content, style,
        num_timesteps=100, steps=2)
    assert np.all(np.isfinite(np.asarray(decoded)))


def test_distill_t_max_defaults_to_config_transfer_timesteps():
    """The documented coupling: with no explicit t_max the distiller
    trains over DiffusionConfig.transfer_timesteps (the SDEdit transfer
    range), so changing the transfer depth propagates (ADVICE r03 found
    the old getattr fallback made this dead code)."""
    cfg = tiny_config()
    cfg.diffusion = dataclasses.replace(cfg.diffusion, transfer_timesteps=64)
    dist = ProgressiveDistiller(cfg, mesh=make_mesh((-1, 1)))
    assert dist.t_max == 64
    assert ProgressiveDistiller(cfg, mesh=make_mesh((-1, 1)),
                                t_max=32).t_max == 32


def test_distill_exhausted_iterator_raises(tmp_path, rng):
    """A one-shot iterator that runs dry before steps_per_stage must fail
    loudly, not spin forever re-entering an empty loader (ADVICE r03)."""
    cfg = tiny_config()
    dist = ProgressiveDistiller(cfg, mesh=make_mesh((-1, 1)), t_max=100)
    S = cfg.model.image_size
    x = jnp.zeros((1, S, S, 1))
    variables = dist.model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    c = rng.rand(8, S, S, 1).astype(np.float32)
    one_shot = iter([((c, [0] * 8), (c, [0] * 8))])
    with pytest.raises(RuntimeError, match="re-iterable"):
        dist.distill(variables, one_shot, stages=(2,), steps_per_stage=4,
                     lr=1e-3, out_dir=tmp_path, seed=0)


def test_distill_inflight_resume(tmp_path, rng, capsys):
    """An interrupted stage resumes from the periodic in-flight save
    (training/distill.py _save_inflight/_restore_inflight): pre-seed the
    in-flight directory exactly as the loop writes it, rerun the cascade,
    and the stage picks up at the saved step (metrics still report the
    full per-stage count); a landed stage removes its in-flight dir; a
    stale dir from a DIFFERENT cascade recipe is ignored."""
    from music_style_transfer_ldm_tpu.training.distill import (
        _restore_inflight, _save_inflight,
    )
    from music_style_transfer_ldm_tpu.training.state import TrainState

    cfg = tiny_config()
    mesh = make_mesh((-1, 1))
    dist = ProgressiveDistiller(cfg, mesh=mesh, t_max=100)
    S = cfg.model.image_size
    x = jnp.zeros((1, S, S, 1))
    variables = dist.model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    # Mid-stage state exactly as distill() builds it (same optimizer).
    teacher_grid, _ = distill_stage_grids(100, 4, 2)
    _, tx = dist._stage_step_fn(teacher_grid, 1e-3, 2, guidance=1.0)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.asarray(5, jnp.int32))
    inflight = tmp_path / "inflight_4to2"
    _save_inflight(inflight, state,
                   {"done": np.asarray(5), "teacher_steps": np.asarray(4),
                    "student_steps": np.asarray(2),
                    "head": np.asarray(0.125, np.float64)})
    # Round trip sanity: step counter and meta survive.
    restored, meta = _restore_inflight(inflight, state)
    assert int(restored.step) == 5 and int(meta["done"]) == 5
    assert float(meta["head"]) == 0.125

    def batch():
        c = rng.rand(8, S, S, 1).astype(np.float32)
        s = rng.rand(8, S, S, 1).astype(np.float32)
        return ((c, [0] * 8), (s, [0] * 8))

    loader = [batch() for _ in range(2)]
    _, info = dist.distill(variables, loader, stages=(4, 2),
                           steps_per_stage=6, lr=1e-3,
                           out_dir=tmp_path, seed=0, inflight_every=5)
    assert "resumed in-flight at step 5/6" in capsys.readouterr().out
    assert info["stages"] == [4, 2] and len(info["history"]) == 2
    # Landed stages removed their in-flight saves.
    assert not inflight.exists()
    assert not (tmp_path / "inflight_2to1").exists()
    # The full metrics row still reports the complete per-stage count.
    metrics = (tmp_path / "distill_metrics.csv").read_text()
    assert ",6," in metrics.splitlines()[1]  # steps column of stage 0

    # Stale dir from another recipe: ignored (fresh stage start), the
    # cascade still completes and cleans the stale dir up on landing.
    _save_inflight(inflight, state,
                   {"done": np.asarray(5), "teacher_steps": np.asarray(8),
                    "student_steps": np.asarray(4),
                    "head": np.asarray(0.0, np.float64)})
    _, info2 = dist.distill(variables, loader, stages=(4, 2),
                            steps_per_stage=2, lr=1e-3,
                            out_dir=tmp_path, seed=0, inflight_every=5)
    assert "resumed" not in capsys.readouterr().out
    assert len(info2["history"]) == 2
    assert not inflight.exists()

"""Progressive distillation of the diffusion sampler (beyond reference).

The reference's samplers walk every grid step in a Python loop
(ref: models/model.py:431-458 generation, :525-552 transfer); this
framework already fuses the walk (diffusion/ddim.py scan, DPM-Solver++
half grid, the whole-trajectory Pallas kernel).  Distillation attacks the
step COUNT itself: following Salimans & Ho, "Progressive Distillation for
Fast Sampling of Diffusion Models" (ICLR 2022), a student with the same
architecture is trained so ONE of its DDIM steps reproduces TWO teacher
steps on an aligned half grid.  Iterating halves the trajectory
(96 -> 48 -> 24 -> 12 -> 6): a full style transfer then costs 6 denoiser
evaluations instead of 99, with the student absorbing the integration
error the coarse grid would otherwise incur.

TPU-first design notes:

* one jitted, donated step per stage: teacher double-step, closed-form
  x0-target solve, student forward + backward, Adam update — all in one
  device program (the teacher needs no gradient, so its two UNet calls
  are plain forwards under ``stop_gradient``-free data flow: its params
  simply aren't differentiated);
* the timestep-pair grid is a static per-stage table; per-sample segment
  indices are drawn on device and gathered from it, so every stage is
  one compiled graph with no host round trips inside the loop;
* only the ``unet`` parameter subtree is trained (optax mask): encoder /
  decoder / style encoder stay frozen, so teacher and student share the
  same latent space and style embeddings by construction, and the frozen
  BatchNorm statistics stay exactly the reference's eval-mode semantics
  (ref: models/model.py:346-347);
* stages recompile (the grid length is static), but each stage's graph is
  far smaller than the LDM train step (no perceptual trunks), and the
  persistent compilation cache makes reruns free.

The distilled checkpoint is a regular full-LDM checkpoint payload (loads
via models/ldm.py:load_ldm) with an extra ``distill`` metadata dict; a
student distilled to N steps is sampled with
``content_style_transfer(..., steps=N + 1)`` — ``transfer_time_grid``
produces exactly the grid the student was trained on.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.diffusion.ddim import transfer_time_grid
from music_style_transfer_ldm_tpu.models.ldm import LDM
from music_style_transfer_ldm_tpu.parallel.mesh import make_mesh
from music_style_transfer_ldm_tpu.parallel.sharding import (
    batch_validity_weights, shard_batch, shard_params,
)
from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib
from music_style_transfer_ldm_tpu.training.metrics import MetricLogger
from music_style_transfer_ldm_tpu.training.optim import make_optimizer
from music_style_transfer_ldm_tpu.training.state import (
    TrainState, as_unit_images, prefetch_to_device,
)


def _save_inflight(path: Path, state: TrainState, meta: dict) -> None:
    """Atomic-enough in-flight save: write aside, then swap directories.

    A crash mid-write leaves the previous in-flight save (or nothing)
    behind, never a half-written directory under the resume path.
    """
    tmp = path.with_name(path.name + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    ckpt_lib.save_train_state(tmp, jax.device_get(state), extra=meta)
    shutil.rmtree(path, ignore_errors=True)
    tmp.rename(path)


def _restore_inflight(path: Path, template: TrainState
                      ) -> tuple[TrainState, dict]:
    """-> (restored TrainState, meta dict with done/stage identifiers)."""
    meta_t = {"done": np.asarray(0), "teacher_steps": np.asarray(0),
              "student_steps": np.asarray(0),
              "head": np.asarray(0.0, np.float64)}
    payload = ckpt_lib.restore_pytree(path, {
        "params": template.params, "batch_stats": template.batch_stats,
        "opt_state": template.opt_state, "step": np.asarray(0),
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
        "extra": meta_t})
    state = TrainState(params=payload["params"],
                       batch_stats=payload["batch_stats"],
                       opt_state=payload["opt_state"],
                       step=jnp.asarray(payload["step"]))
    # Re-place restored host arrays on their template leaves' MESH
    # shardings so a tp/dp cascade resumes with identical layouts.
    # Leaves the template holds uncommitted (e.g. optimizer step counters
    # created eagerly by tx.init) must STAY uncommitted: device_put would
    # pin them to one device and the jitted step then rejects the
    # committed-device mix.
    def _replace(t, h):
        sh = getattr(t, "sharding", None)
        if isinstance(sh, jax.sharding.NamedSharding):
            return jax.device_put(h, sh)
        return jnp.asarray(h)

    state = jax.tree_util.tree_map(_replace, template, state)
    return state, payload["extra"]


def ddim_step(z_t: jax.Array, eps_hat: jax.Array, ab_t: jax.Array,
              ab_s: jax.Array) -> jax.Array:
    """One deterministic DDIM update (eta=0) with per-sample alpha-bars.

    Same update rule as diffusion/ddim.py:87-91 (ref: model.py:446-458),
    factored out so the distillation target algebra and the sampler can
    never drift apart.  ab_* are broadcastable to z_t (e.g. [B, 1, 1, 1]).
    """
    x0_hat = (z_t - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
    return jnp.sqrt(ab_s) * x0_hat + jnp.sqrt(1.0 - ab_s) * eps_hat


def solve_x0_target(z_t: jax.Array, z_ss: jax.Array, ab_t: jax.Array,
                    ab_s: jax.Array) -> jax.Array:
    """Invert one DDIM step: the x0 a single t->s step needs to land on z_ss.

    From z_s = sqrt(ab_s) x0 + sqrt(1-ab_s) eps with
    eps = (z_t - sqrt(ab_t) x0) / sqrt(1-ab_t):

        x0 = (z_ss - c z_t) / (sqrt(ab_s) - c sqrt(ab_t)),
        c  = sqrt((1-ab_s) / (1-ab_t)).

    The denominator is strictly positive for s < t (ab_s > ab_t and
    c < 1).  This is the Salimans-Ho single-step target with the DDIM
    parameterization; tests/test_distill.py checks the round trip is
    exact: ddim_step(z_t, eps(x0_target), ...) == z_ss.
    """
    c = jnp.sqrt((1.0 - ab_s) / (1.0 - ab_t))
    return (z_ss - c * z_t) / (jnp.sqrt(ab_s) - c * jnp.sqrt(ab_t))


def distill_stage_grids(t_max: int, n_teacher_steps: int, factor: int = 2
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(teacher_grid, student_grid) for one stage.

    The teacher grid has n_teacher_steps updates (n+1 linspace points over
    [t_max-1, 0], identical to transfer_time_grid); the student grid is
    every ``factor``-th point, so ONE student step spans ``factor``
    consecutive teacher steps.  n_teacher_steps must be divisible by
    factor so the endpoints align; because
    linspace(a, 0, n+1)[::f] == linspace(a, 0, n//f+1) exactly (same real
    values, so equal after the int floor), a student distilled here
    samples bit-identically via content_style_transfer(steps=n//f + 1).

    factor=2 is the classic Salimans-Ho halving; the final cascade stage
    can use factor=n_teacher_steps to land on a ONE-step student from an
    odd step count (e.g. 3 -> 1, where halving cannot go).
    """
    factor = int(factor)
    if factor < 2:
        raise ValueError(f"factor must be >= 2, got {factor}")
    if n_teacher_steps % factor:
        raise ValueError(
            f"teacher steps must be divisible by the stage factor, got "
            f"{n_teacher_steps} % {factor}")
    teacher = transfer_time_grid(t_max, n_teacher_steps + 1)
    student = teacher[::factor]
    expected = transfer_time_grid(t_max, n_teacher_steps // factor + 1)
    if not np.array_equal(student, expected):
        # The whole "sample a distilled student with the STOCK sampler at
        # --sample-steps N+1" contract rests on this grid identity; a bare
        # assert would vanish under `python -O` (ADVICE r03).
        raise ValueError(
            f"student grid {student} != stock sampler grid {expected} for "
            f"t_max={t_max}, teacher={n_teacher_steps}, factor={factor}")
    return teacher, student


def _train_unet_only_mask(params):
    """True (frozen) for every subtree except the UNet."""
    return {k: jax.tree_util.tree_map(lambda _: k != "unet", v)
            for k, v in params.items()}


class ProgressiveDistiller:
    """Halve the sampler grid stage by stage (96 -> 48 -> ... -> final).

    Built against the same config/loader/checkpoint plumbing as
    training/train_ldm.py; consumes the pair loader's
    ((content, _), (style, _)) batches.
    """

    def __init__(self, config, mesh=None, t_max: Optional[int] = None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh.mesh_shape)
        cm, cd, ct = config.model, config.diffusion, config.train
        self.model = LDM(latent_dim=cm.latent_dim,
                         num_timesteps=cd.num_timesteps,
                         beta_start=cd.beta_start, beta_end=cd.beta_end,
                         unet_num_filters=cm.unet_num_filters,
                         style_num_filters=cm.style_num_filters,
                         dtype=jnp.dtype(ct.compute_dtype))
        # Transfer walks the first `transfer_timesteps` of the schedule
        # (SDEdit, ref: model.py:514); distill over that same range.
        self.t_max = int(t_max if t_max is not None
                         else cd.transfer_timesteps)

    # ---------------- jitted stage step ------------------------------------

    def _stage_step_fn(self, teacher_grid: np.ndarray, lr: float,
                       factor: int = 2, guidance: float = 1.0):
        """Build (step_fn, tx) for one stage; teacher_grid is static.

        One student step t -> s spans ``factor`` consecutive teacher DDIM
        steps (factor=2 is classic halving).  The x0-target solve only
        involves the segment ENDPOINTS, so the same closed form covers any
        factor; the teacher walk is unrolled (factor is small and static).

        guidance != 1 distills a GUIDED teacher (Meng et al. 2023, "On
        Distillation of Guided Diffusion Models", fixed scale variant):
        each teacher eps is the classifier-free combination
        eps_u + g*(eps_c - eps_u) — both branches in one doubled-batch
        UNet call, same layout as models/ldm.py:_denoise_fn — while the
        student stays a plain conditional predictor.  The student thus
        bakes the amplified style into its single branch: sampling it
        needs NO guidance (and no 2x batch) at inference.  Requires a
        style_dropout-trained teacher so its unconditional branch is real.
        """
        grid = jnp.asarray(teacher_grid, jnp.int32)
        factor = int(factor)
        guidance = float(guidance)
        n_student = (len(teacher_grid) - 1) // factor
        sched = self.model.schedule
        model = self.model
        tx = make_optimizer("adam", learning_rate=lr,
                            freeze_mask=_train_unet_only_mask)

        def ab(t, ndim):
            return sched.alpha_bars[t].reshape(t.shape + (1,) * (ndim - 1))

        def step(state: TrainState, teacher_params, content, style, key,
                 weights=None):
            ikey, nkey = jax.random.split(key)
            content = as_unit_images(content).astype(jnp.float32)
            style = as_unit_images(style).astype(jnp.float32)
            batch = content.shape[0]
            frozen = {"params": teacher_params,
                      "batch_stats": state.batch_stats}

            # Per-sample student segment: one student step t -> s spans the
            # teacher grid points factor*i .. factor*i + factor.
            i = jax.random.randint(ikey, (batch,), 0, n_student)
            t, s = grid[factor * i], grid[factor * i + factor]

            z0 = model.apply(frozen, content, method=LDM.encode)
            z0 = z0.astype(jnp.float32)
            emb = model.apply(frozen, style, method=LDM.style_embed)
            nd = z0.ndim
            eps = jax.random.normal(nkey, z0.shape, jnp.float32)
            z_t = (jnp.sqrt(ab(t, nd)) * z0
                   + jnp.sqrt(1.0 - ab(t, nd)) * eps)

            def eps_of(params, z, tv):
                var = {"params": params, "batch_stats": state.batch_stats}
                return model.apply(var, z, tv, emb,
                                   method=LDM.denoise).astype(jnp.float32)

            if guidance == 1.0:
                def teacher_eps(z, tv):
                    return eps_of(teacher_params, z, tv)
            else:
                # Guided teacher: classifier-free combination, both
                # branches in one doubled-batch UNet call (same 2B layout
                # as models/ldm.py:_denoise_fn so the compiled conv shapes
                # match the sampler's guided path).
                null_emb = jax.tree_util.tree_map(jnp.zeros_like, emb)
                emb2 = jax.tree_util.tree_map(
                    lambda c, u: jnp.concatenate([c, u], axis=0),
                    emb, null_emb)
                var2 = {"params": teacher_params,
                        "batch_stats": state.batch_stats}

                def teacher_eps(z, tv):
                    z2 = jnp.concatenate([z, z], axis=0)
                    t2 = jnp.concatenate([tv, tv], axis=0)
                    eps2 = model.apply(var2, z2, t2, emb2,
                                       method=LDM.denoise).astype(
                                           jnp.float32)
                    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
                    return eps_u + guidance * (eps_c - eps_u)

            # Teacher: `factor` DDIM steps on its grid (no gradient flows —
            # the teacher params are not the differentiated argument).
            z_ss = z_t
            for j in range(factor):
                tj = grid[factor * i + j]
                tn = grid[factor * i + j + 1]
                z_ss = ddim_step(z_ss, teacher_eps(z_ss, tj),
                                 ab(tj, nd), ab(tn, nd))
            x0_target = solve_x0_target(z_t, z_ss, ab(t, nd), ab(s, nd))

            # Truncated-SNR weighting (Salimans-Ho eq. 9): at low noise the
            # x0-MSE is scaled back up to an eps-MSE; at high noise plain
            # x0-MSE.  Per-sample, capped below at 1.
            ab_t_flat = sched.alpha_bars[t]
            w_snr = jnp.maximum(ab_t_flat / (1.0 - ab_t_flat), 1.0)
            if weights is not None:
                w_snr = w_snr * weights

            def loss_fn(params):
                eps_s = eps_of(params, z_t, t)
                x0_s = (z_t - jnp.sqrt(1.0 - ab(t, nd)) * eps_s) \
                    / jnp.sqrt(ab(t, nd))
                per = jnp.mean(jnp.square(x0_s - x0_target),
                               axis=tuple(range(1, nd)))
                return jnp.sum(w_snr * per) / jnp.maximum(
                    jnp.sum(weights) if weights is not None
                    else jnp.float32(batch), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            new_state = TrainState(params=params,
                                   batch_stats=state.batch_stats,
                                   opt_state=opt_state,
                                   step=state.step + 1)
            return new_state, {"distill_loss": loss}

        return jax.jit(step, donate_argnums=(0,)), tx

    # ---------------- stage/driver loop ------------------------------------

    def distill(self, variables: dict, train_loader,
                stages: Sequence[int] = (96, 48, 24, 12, 6),
                steps_per_stage: int = 400, lr: float = 1e-4,
                out_dir: str | Path = "runs/distill",
                seed: int = 0, guidance: float = 1.0,
                inflight_every: int = 200) -> tuple[dict, dict]:
        """Run the full halving schedule.

        variables: full-LDM {"params", "batch_stats"} (the converged
        teacher).  stages: teacher step counts; stage k distills a student
        with stages[k+1] steps (the next stage's teacher).  The LAST
        stage's student halves an even count, or — when the final teacher
        count is odd — collapses it to a ONE-step student (factor = the
        whole count), e.g. stages=(48, 24, 12, 6, 3) ends at 1 denoiser
        eval.  Each stage factor (teacher/student ratio) must be an
        integer >= 2.

        guidance != 1 distills a classifier-free-GUIDED teacher (Meng et
        al. 2023, fixed-scale variant): the FIRST stage's teacher eps is
        the CFG combination at this scale, so the stage-1 student bakes
        the amplified style into its plain conditional branch; every later
        stage's teacher is that already-guidance-baked student and runs
        unguided.  Sampling any distilled student then needs neither
        ``guidance=`` nor the 2x batch.  Requires a style_dropout-trained
        teacher checkpoint (models/ldm.py:style_drop_mask).

        Returns (distilled_variables, info); intermediate students are
        checkpointed per stage, so every step count in the cascade stays
        usable.

        inflight_every > 0 additionally checkpoints the live TrainState
        every that-many steps (``out_dir/inflight_<stage>``), and a rerun
        of the same cascade resumes the interrupted stage from the last
        such save instead of from the stage start: long stages survive
        relay stalls and host restarts (an 800-step stage is multi-hour
        on the single-core CPU fallback).  The RNG stream continues
        exactly (keys are derived from the restored step counter); the
        data order does not (the loader reshuffles), which matches plain
        epoch-resume semantics elsewhere in the trainers.
        """
        stages = [int(n) for n in stages]
        students = []
        for k, n in enumerate(stages):
            s = (stages[k + 1] if k + 1 < len(stages)
                 else (n // 2 if n % 2 == 0 else 1))
            if s < 1 or n % s or n // s < 2:
                raise ValueError(
                    f"stage {k}: student steps {s} must divide teacher "
                    f"steps {n} with an integer factor >= 2")
            students.append(s)
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        logger = MetricLogger(out_dir / "distill_metrics.csv")

        params = shard_params(jax.tree_util.tree_map(jnp.asarray,
                                                     variables["params"]),
                              self.mesh)
        # jnp.array (copy=True): batch_stats ride inside the donated
        # TrainState, so aliasing the caller's live arrays would delete
        # them out from under the caller on the first step.
        batch_stats = shard_params(
            jax.tree_util.tree_map(jnp.array, variables["batch_stats"]),
            self.mesh)
        n_data = self.mesh.shape["data"]
        base_key = jax.random.PRNGKey(seed + 777)
        history = []

        for stage_idx, n_teacher in enumerate(stages):
            n_student = students[stage_idx]
            factor = n_teacher // n_student
            teacher_grid, _ = distill_stage_grids(self.t_max, n_teacher,
                                                  factor)
            step_fn, tx = self._stage_step_fn(
                teacher_grid, lr, factor,
                guidance=guidance if stage_idx == 0 else 1.0)
            teacher_params = params
            state = TrainState(
                params=jax.tree_util.tree_map(jnp.array, teacher_params),
                batch_stats=batch_stats, opt_state=tx.init(teacher_params),
                step=jnp.zeros((), jnp.int32))

            done, losses, t0 = 0, [], time.time()
            head_override = None
            inflight = out_dir / f"inflight_{n_teacher}to{n_student}"
            if inflight_every and inflight.exists():
                try:
                    state, meta = _restore_inflight(inflight, state)
                    if (int(meta["teacher_steps"]) == n_teacher
                            and int(meta["student_steps"]) == n_student):
                        done = int(meta["done"])
                        head_override = (float(meta["head"])
                                         if done >= 20 else None)
                        print(f"  distill {n_teacher}->{n_student}: "
                              f"resumed in-flight at step {done}/"
                              f"{steps_per_stage}", flush=True)
                    else:  # stale dir from a different cascade recipe
                        state = TrainState(
                            params=jax.tree_util.tree_map(
                                jnp.array, teacher_params),
                            batch_stats=batch_stats,
                            opt_state=tx.init(teacher_params),
                            step=jnp.zeros((), jnp.int32))
                except Exception as e:  # noqa: BLE001 — corrupt save
                    print(f"  distill: in-flight restore failed "
                          f"({e!r}); restarting stage", flush=True)
            while done < steps_per_stage:
                def place(batch):
                    (content, _), (style, _) = batch
                    w = batch_validity_weights(len(content), n_data,
                                               self.mesh)
                    return (shard_batch(jnp.asarray(content), self.mesh),
                            shard_batch(jnp.asarray(style), self.mesh), w)

                made_progress = False
                for content, style, w in prefetch_to_device(train_loader,
                                                            place):
                    made_progress = True
                    key = jax.random.fold_in(
                        base_key, stage_idx * 1_000_000 + done)
                    state, metrics = step_fn(state, teacher_params,
                                             content, style, key, w)
                    losses.append(metrics["distill_loss"])
                    done += 1
                    if done % 100 == 0 or done == steps_per_stage:
                        # One host readback per 100 steps: negligible sync
                        # cost, and long stages (800 steps is ~25 min on
                        # CPU) are observable instead of silent.
                        print(f"  distill {n_teacher}->{n_student} step "
                              f"{done}/{steps_per_stage} "
                              f"loss {float(losses[-1]):.5f} "
                              f"({done / (time.time() - t0):.2f} steps/s)",
                              flush=True)
                    if (inflight_every and done % inflight_every == 0
                            and done < steps_per_stage):
                        head = (head_override if head_override is not None
                                else float(np.mean(jax.device_get(
                                    losses[:20]))) if len(losses) >= 20
                                else 0.0)
                        _save_inflight(
                            inflight, state,
                            {"done": np.asarray(done),
                             "teacher_steps": np.asarray(n_teacher),
                             "student_steps": np.asarray(n_student),
                             "head": np.asarray(head, np.float64)})
                    if done >= steps_per_stage:
                        break
                if not made_progress:
                    # A one-shot iterator that exhausted before
                    # steps_per_stage would otherwise spin here forever:
                    # every re-entry of prefetch_to_device yields nothing
                    # and `done` never advances (ADVICE r03).
                    raise RuntimeError(
                        f"train_loader yielded no batches in a full pass "
                        f"({done}/{steps_per_stage} steps into stage "
                        f"{n_teacher}->{n_student}); distillation needs a "
                        f"re-iterable loader (e.g. BatchLoader), not an "
                        f"exhausted one-shot iterator")

            # The donated step consumed the stage-entry arrays; the live
            # batch_stats are the ones threaded through the final state.
            batch_stats = state.batch_stats
            losses = [float(v) for v in jax.device_get(losses)]
            # On an in-flight resume this run's first losses are mid-stage
            # values; the stage-entry head travels in the in-flight meta.
            head = (head_override if head_override is not None
                    else float(np.mean(losses[:20])) if losses else 0.0)
            tail = float(np.mean(losses[-20:])) if losses else head
            logger.log(epoch=stage_idx, teacher_steps=n_teacher,
                       student_steps=n_student, steps=done,
                       loss_head=head, loss_tail=tail,
                       seconds=time.time() - t0)
            history.append({"teacher_steps": n_teacher,
                            "student_steps": n_student,
                            "loss_head": head, "loss_tail": tail})
            params = state.params
            ckpt_lib.save_pytree(
                out_dir / f"distilled_{n_student}",
                {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(batch_stats),
                 "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
                 "distill": {"steps": n_student, "t_max": self.t_max,
                             "stages": stages[:stage_idx + 1],
                             "guidance": guidance}})
            if inflight.exists():  # stage landed; drop the partial save
                shutil.rmtree(inflight, ignore_errors=True)

        info = {"steps": students[-1], "t_max": self.t_max,
                "stages": stages, "guidance": guidance,
                "history": history}
        return ({"params": params, "batch_stats": batch_stats}, info)

"""End-to-end training-quality gate: fit a scene from random init and
measure held-out PSNR/SSIM (VERDICT r3 missing #3 / task 5).

"Gradients are parity-correct" (PARITY_TPU.json) is necessary but not
sufficient evidence that TRAINING works: this script proves the whole
differentiable pipeline — renderer, backward kernels, optimizer, adaptive
density control, PLY round-trip — recovers a scene it has never seen the
parameters of:

1. builds a non-trivial synthetic GT scene (textured sphere shell + random
   blob field), renders orbit-view GT images with the TPU renderer, and
   writes them + cameras.json to disk;
2. fits from random init with the adaptive MULTIVIEW train step
   (trainer.make_adaptive_multiview_train_step: view-averaged gradients +
   densification — per-view rotation thrashes Adam across conflicting
   single-view gradients and plateaus ~15 dB lower) and writes the fitted
   scene through the PLY round-trip;
3. loads the fitted PLY back and evaluates PSNR/SSIM on HELD-OUT views
   (never trained on), asserting zero dropped instances;
4. writes TRAIN_r05.json (iters, wall time, re-pin events, per-view and mean PSNR/SSIM).

Done criterion: held-out PSNR >= 28 dB.

Usage: python scripts/train_quality.py   (defaults = the recipe that
produced the checked-in r4 artifact; the r5 512x384 gate ran with --width 512 --height 384 --init 20000 --grad-threshold 1e-6 --capacity-factor 5 --iters 4000)
(~minutes on the TPU chip; runs wherever JAX runs — CPU works but is slow.)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(
    __file__))))

import argparse
import json
import os
import sys
import tempfile
import time


def make_gt_scene(n_sphere: int, n_blobs: int, seed: int = 0):
    """Sphere shell with normal-coded colors + a SMOOTH position-colored
    blob field. The appearance is spatially coherent on purpose: a
    random-color confetti GT is a noise texture no novel-view fit can
    reach 28 dB on — the gate should test that training recovers structure
    (geometry, opacity, smooth radiance), not memorizes noise."""
    import numpy as np

    from gsplat_tpu.io.synthetic import random_scene, sphere_scene
    from gsplat_tpu.scene import GaussianScene, color_to_dc

    # GT design matters for a NOVEL-VIEW gate (failure modes measured
    # during development):
    # - random-color confetti = a noise texture (fit 12 dB);
    # - a camera-enveloping translucent blob field = depth-ambiguous fog
    #   (train 28 dB, held-out 17 dB — volumetric ambiguity);
    # here: an OBJECT — opaque overlapping normal-colored shell + a ring of
    # solid smooth-colored satellite blobs — with a clean silhouette
    # against the background, the textbook well-posed NVS setup.
    sph = sphere_scene(n_sphere, radius=0.8, seed=seed, scale=0.08)
    sph_op = np.full((n_sphere,), 4.0, np.float32)   # sigmoid ~0.982: opaque
    blobs = random_scene(n_blobs, seed=seed + 1, extent=1.0,
                         scale_range=(0.06, 0.12), num_labels=8)
    m = np.array(np.asarray(blobs.means))
    # push the blobs out of the sphere onto a satellite ring (radius
    # 1.0-1.3) so they occlude/parallax against the shell, not fog it
    r = np.linalg.norm(m, axis=1, keepdims=True)
    m = m / np.maximum(r, 1e-6) * (1.0 + 0.3 * (r / np.abs(m).max()))
    rgb = 0.5 + 0.45 * np.stack([np.sin(2.1 * m[:, 0] + 0.3),
                                 np.sin(2.3 * m[:, 1] + 1.7),
                                 np.sin(2.7 * m[:, 2] + 3.1)], axis=-1)
    sh = np.array(np.asarray(blobs.sh))
    sh[:, 0, :] = color_to_dc(rgb)
    opac = np.full((m.shape[0],), 4.0, np.float32)
    cat = {}
    repl = {"sh": sh, "opacities": opac, "means": m}
    for f in ("means", "log_scales", "quats", "opacities", "sh", "labels"):
        sp = np.asarray(getattr(sph, f))
        if f == "opacities":
            sp = sph_op
        cat[f] = np.concatenate([sp, repl.get(f, np.asarray(
            getattr(blobs, f)))])
    return GaussianScene(**cat)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4500)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--views", type=int, default=28,
                    help="total orbit views; the last 4 are held out")
    ap.add_argument("--gt-sphere", type=int, default=1500)
    ap.add_argument("--gt-blobs", type=int, default=400)
    ap.add_argument("--init", type=int, default=4000)
    ap.add_argument("--densify-every", type=int, default=200)
    ap.add_argument("--grad-threshold", type=float, default=2e-5,
                    help="densify trigger on the VIEW-AVERAGED grad norm "
                         "(the 3DGS 2e-4 default assumes per-view "
                         "accumulation, ~V times larger)")
    ap.add_argument("--lr", type=float, default=7e-3)
    ap.add_argument("--capacity-factor", type=float, default=4.0,
                    help="live-set capacity = init * factor")
    ap.add_argument("--budget-headroom", type=float, default=1.35,
                    help="slack over the measured instance budget so "
                         "densification growth between re-pins does not "
                         "shed instances")
    ap.add_argument("--out", default="TRAIN_r05.json")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax
    from gsplat_tpu.config import DEFAULT
    from gsplat_tpu.io import ply
    from gsplat_tpu.io.cameras import save_cameras
    from gsplat_tpu.models.losses import psnr, ssim
    from gsplat_tpu.render.api import measure_budgets_multi, render

    t_all = time.time()
    work = args.workdir or tempfile.mkdtemp(prefix="train_quality_")
    os.makedirs(os.path.join(work, "images"), exist_ok=True)
    print(f"workdir: {work}", file=sys.stderr)

    # --- 1. GT scene + views ------------------------------------------------
    from gsplat_tpu.io.cameras import look_at_camera

    gt = make_gt_scene(args.gt_sphere, args.gt_blobs)
    # orbit ring with staggered elevation so the views constrain 3D
    # structure, not just one great circle
    cams = []
    for i in range(args.views):
        a = 2 * np.pi * i / args.views
        eye = np.array([3.4 * np.cos(a), 1.1 * np.sin(2.1 * i),
                        3.4 * np.sin(a)])
        cams.append(look_at_camera(
            eye, (0, 0, 0), width=args.width, height=args.height,
            cam_id=i, img_name=f"view{i:03d}"))
    # hold out 4 views INTERLEAVED around the orbit (a contiguous held-out
    # arc would be an azimuth wedge the training never observes — novel-view
    # synthesis cannot invent unseen geometry; interpolation between seen
    # views is the standard NVS evaluation)
    hold_idx = set(np.linspace(0, args.views, 4, endpoint=False,
                               dtype=int) + args.views // 8)
    train_cams = [c for i, c in enumerate(cams) if i not in hold_idx]
    hold_cams = [c for i, c in enumerate(cams) if i in hold_idx]

    b, kb, nw = measure_budgets_multi(gt, cams, DEFAULT)
    gt_images = {}
    for c in cams:
        out = render(gt, c, DEFAULT, budget=b, kernel_budget=kb,
                     num_windows=nw)
        assert int(out["num_dropped"]) == 0
        img = np.clip(np.asarray(out["image"]), 0.0, 1.0)
        gt_images[c.img_name] = img
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(work, "images", c.img_name + ".png"))
    save_cameras(os.path.join(work, "cameras_train.json"), train_cams)
    print(f"GT: {gt.num_gaussians} gaussians, {len(train_cams)} train + "
          f"{len(hold_cams)} held-out views at {args.width}x{args.height}",
          file=sys.stderr)

    # --- 2. fit from random init: adaptive multiview step + densify --------
    import jax.numpy as jnp

    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.models import densify as dz, trainer
    from gsplat_tpu.render.projection import CameraParams

    t_train = time.time()
    init = random_scene(args.init, seed=5, extent=1.1,
                        scale_range=(0.03, 0.08))
    capacity = -(-int(args.init * args.capacity_factor) // 128) * 128
    params0, labels = dz.pad_to_capacity(
        trainer.SceneParams.from_scene(init), jnp.asarray(init.labels),
        capacity)

    # MEASURED budgets, re-pinned as densification grows the live set
    # (VERDICT r4 task 6: exercise re-bucketing — the old fixed
    # budget_factor=10 heuristic oversized the kernel grid ~4x at scale).
    # Dead capacity slots are invalid at projection, so measuring on the
    # padded scene tracks exactly the LIVE set.
    from gsplat_tpu.render.tiles import bucket_budget

    repin_events = []

    def measure(scene_now):
        bu, kbu, nwu = measure_budgets_multi(scene_now, train_cams, DEFAULT)
        hr = args.budget_headroom
        return (bucket_budget(int(bu * hr), DEFAULT.tiles.chunk),
                bucket_budget(int(kbu * hr), DEFAULT.tiles.chunk),
                bucket_budget(int(nwu * hr), 8))

    def build_step(bu, kbu, nwu):
        return trainer.make_adaptive_multiview_train_step(
            (args.width, args.height), DEFAULT, lr=args.lr,
            lr_final=args.lr / 20.0, decay_steps=args.iters, budget=bu,
            kernel_budget=kbu, num_windows=nwu, loss="l2")

    bu, kbu, nwu = measure(params0.to_scene(labels))
    step = build_step(bu, kbu, nwu)
    print(f"initial budgets: {bu} kernel={kbu} windows={nwu}",
          file=sys.stderr)
    state = trainer.init_state(params0.to_scene(labels), lr=args.lr,
                               lr_final=args.lr / 20.0,
                               decay_steps=args.iters)
    stats = dz.DensifyStats.zeros(capacity)
    camsb = trainer.stack_cameras(
        [CameraParams.from_camera(c) for c in train_cams])
    targets = jnp.asarray(np.stack(
        [gt_images[c.img_name] for c in train_cams]))
    bg = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)
    densify_until = int(0.6 * args.iters)
    nd = 0

    def repin(it, trigger):
        nonlocal bu, kbu, nwu, step
        nb, nkb, nnw = measure(state.params.to_scene(labels))
        if (nb, nkb, nnw) != (bu, kbu, nwu):
            repin_events.append(dict(
                iter=it, trigger=trigger,
                old=dict(budget=bu, kernel_budget=kbu, num_windows=nwu),
                new=dict(budget=nb, kernel_budget=nkb, num_windows=nnw)))
            print(f"re-pin at it {it} ({trigger}): budget {bu}->{nb} "
                  f"kernel {kbu}->{nkb} windows {nwu}->{nnw}",
                  file=sys.stderr)
            bu, kbu, nwu = nb, nkb, nnw
            step = build_step(bu, kbu, nwu)

    for it in range(args.iters):
        state, stats, loss, nd = step(state, stats, labels, camsb, targets,
                                      bg)
        if int(nd) > 0:
            # the dropped step's gradients were biased: re-pin to the
            # grown live set and RE-RUN the step at full coverage
            repin(it, f"num_dropped={int(nd)}")
            state, stats, loss, nd = step(state, stats, labels, camsb,
                                          targets, bg)
            assert int(nd) == 0, f"re-pinned step still dropped {int(nd)}"
        if (args.densify_every and it > 0 and it < densify_until
                and it % args.densify_every == 0):
            key, sub = jax.random.split(key)
            new_params, labels, stats, written = dz.densify_and_prune(
                state.params, labels, stats, sub, 1.3,
                dz.DensifyConfig(grad_threshold=args.grad_threshold))
            opt_state = trainer.zero_adam_rows(state.opt_state, written)
            state = trainer.TrainState(new_params, opt_state, state.step)
            repin(it, "densify")
        if it % 250 == 0 or it == args.iters - 1:
            print(f"it {it}: loss {float(loss):.5f} "
                  f"alive {int(dz.num_alive(state.params))} "
                  f"dropped {int(nd)}", file=sys.stderr)
    assert int(nd) == 0, f"train step dropped {int(nd)} instances"

    # PLY round-trip: compact the alive set and write/reload
    alive = np.asarray(
        state.params.opacities) > dz.DEAD_LOGIT + 1.0
    final = state.params.to_scene(labels)
    import dataclasses as _dc
    final = _dc.replace(
        final, **{f: np.asarray(getattr(final, f))[alive]
                  for f in ("means", "log_scales", "quats", "opacities",
                            "sh", "labels")})
    fitted_ply = os.path.join(work, "fitted.ply")
    ply.scene_to_ply(fitted_ply, final)
    train_s = time.time() - t_train

    # --- 3. held-out evaluation --------------------------------------------
    fitted = ply.scene_from_ply(fitted_ply)
    bf, kbf, nwf = measure_budgets_multi(fitted, hold_cams, DEFAULT)
    per_view = []
    import jax.numpy as jnp
    for c in hold_cams:
        out = render(fitted, c, DEFAULT, budget=bf, kernel_budget=kbf,
                     num_windows=nwf)
        nd = int(out["num_dropped"])
        assert nd == 0, f"held-out render dropped {nd} instances"
        img = jnp.clip(out["image"], 0.0, 1.0)
        tgt = jnp.asarray(gt_images[c.img_name])
        per_view.append(dict(view=c.img_name,
                             psnr=round(float(psnr(img, tgt)), 2),
                             ssim=round(float(ssim(img, tgt)), 4)))
        print(f"held-out {c.img_name}: PSNR {per_view[-1]['psnr']} dB "
              f"SSIM {per_view[-1]['ssim']}", file=sys.stderr)
    mean_psnr = round(sum(v["psnr"] for v in per_view) / len(per_view), 2)
    mean_ssim = round(sum(v["ssim"] for v in per_view) / len(per_view), 4)

    artifact = dict(
        metric="held-out novel-view quality after fitting from random init "
               "(full product path: cli.train + densification + PLY "
               "round-trip)",
        backend=jax.default_backend(),
        gt=dict(num_gaussians=int(gt.num_gaussians),
                views=args.views, held_out=len(hold_cams),
                width=args.width, height=args.height),
        fit=dict(init_gaussians=args.init,
                 final_gaussians=int(fitted.num_gaussians),
                 iters=args.iters, loss="l2",
                 step="make_adaptive_multiview_train_step", lr=args.lr,
                 densify_every=args.densify_every,
                 train_wall_s=round(train_s, 1),
                 budget_repin_events=repin_events,
                 final_budgets=dict(budget=bu, kernel_budget=kbu,
                                    num_windows=nwu)),
        held_out=per_view,
        mean_psnr_db=mean_psnr,
        mean_ssim=mean_ssim,
        num_dropped=0,
        wall_s=round(time.time() - t_all, 1),
        target="mean held-out PSNR >= 28 dB (VERDICT r3 task 5)",
        reached=bool(mean_psnr >= 28.0),
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"mean held-out PSNR {mean_psnr} dB, SSIM {mean_ssim} "
          f"({'PASS' if artifact['reached'] else 'BELOW TARGET'}); "
          f"wrote {args.out}")
    return 0 if artifact["reached"] else 2


if __name__ == "__main__":
    sys.exit(main())

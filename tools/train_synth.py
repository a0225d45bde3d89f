#!/usr/bin/env python
"""Train car/armor detectors on synthetic RoboMaster scenes (real weights
for accuracy evidence — the reference's car.onnx/armor.onnx blobs are absent
from the snapshot, see SURVEY.md §2.6).

The training distribution IS the inference distribution: car batches are
full-camera-resolution (2592x2048) scenes pushed through the framework's own
device letterbox (ops/preprocess.letterbox — same bilinear semantics, pad
bars and BGR->RGB blob the deployed cascade uses); armor batches are
single-car canvases pushed through the fused crop+letterbox
(ops/preprocess.letterbox_crop) with detection-jittered crop boxes — exactly
what the cascade feeds the armor model (detect/detector.py:detect_fn). The
armor stage alternates 640/320 network inputs so one checkpoint serves the
armor-input-size speed knob (configs.py, PERF.md lever 1).

Runs on whatever backend JAX resolves (the real TPU chip by default in this
environment). All batches are generated on the host, preprocessed on device
ONCE at staging, and reused — the tunneled dev chip's ~60 MB/s host link
stays off the step path (PERF.md).

Usage:
  python tools/train_synth.py --stage car   --steps 2500 --out assets/models
  python tools/train_synth.py --stage armor --steps 4000 --out assets/models
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAM_H, CAM_W = 2048, 2592  # reference camera frames (samples/main.cpp:12)
ARMOR_CANVAS = 704  # single-car canvas for the crop path


def _transform_boxes(xywh, valid, ratio, dw, dh, origin=(0.0, 0.0)):
    """Source-pixel boxes -> letterboxed blob coordinates.

    Inverse of the restore step (detect restores x_src = (x_blob - dw) *
    ratio + origin, ops/detect_ops.py), so training targets live exactly
    where decode expects them.
    """
    out = xywh.copy()
    out[..., 0] = (xywh[..., 0] - origin[0]) / ratio + dw
    out[..., 1] = (xywh[..., 1] - origin[1]) / ratio + dh
    out[..., 2] = xywh[..., 2] / ratio
    out[..., 3] = xywh[..., 3] / ratio
    return np.where(valid[..., None], out, 0.0).astype(np.float32)


def stage_car_batches(args, jax, jnp, rng):
    """Full-res scenes -> device letterbox -> (blobs, targets) batches."""
    from rm_radar_tpu.ops.preprocess import letterbox_batch
    from rm_radar_tpu.train.loss import DetectionTargets
    from rm_radar_tpu.train.synth import make_scene, scene_to_targets

    capacity = 8
    letterbox = jax.jit(
        lambda imgs: letterbox_batch(imgs, args.size, args.size)
    )
    batches = []
    for _ in range(args.n_batches):
        # --hard: a 50/50 easy/hard scene mix, so the hard-tier failure
        # modes are learned without regressing the easy tier.
        # --hard: 50/50 easy/hard; --arena: an independent 50% of scenes
        # render in the real-domain arena style with SMALLER cars (real
        # match robots are 40-180 px in the 2592x2048 frame — the flat
        # domain's 180-660 px never taught that scale).
        def one_scene():
            arena = bool(getattr(args, "arena", False) and rng.random() < 0.5)
            return make_scene(
                rng,
                CAM_H,
                CAM_W,
                max_cars=6,
                car_size=(48, 280) if arena else (180, 660),
                hard=bool(getattr(args, "hard", False) and rng.random() < 0.5),
                arena=arena,
            )

        scenes = [one_scene() for _ in range(args.batch)]
        images, xywh, label, valid = scene_to_targets(scenes, "car", capacity)
        blobs, pparams = letterbox(images)
        pp = jax.device_get(pparams)
        t_xywh = _transform_boxes(
            xywh, valid, pp.ratio[:, None], pp.dw[:, None], pp.dh[:, None]
        )
        batches.append(
            (
                blobs,
                jax.device_put(
                    DetectionTargets(
                        xywh=jnp.asarray(t_xywh),
                        label=jnp.asarray(label),
                        valid=jnp.asarray(valid),
                    )
                ),
            )
        )
    return batches


def stage_armor_batches(args, jax, jnp, rng, dst: int):
    """Single-car canvases -> fused crop+letterbox at ``dst`` -> batches.

    Crop boxes are jittered around the true car box (+-6%), modeling the
    detector's localization error; plates clipped below half visibility by
    the jitter are dropped from the targets.
    """
    import functools

    from rm_radar_tpu.ops.preprocess import letterbox_crop
    from rm_radar_tpu.train.loss import DetectionTargets
    from rm_radar_tpu.train.synth import make_scene

    crop_fn = jax.jit(
        jax.vmap(
            functools.partial(
                letterbox_crop, dst_height=dst, dst_width=dst
            )
        )
    )
    capacity = 2
    batches = []
    for _ in range(args.n_batches):
        canvases, crops, plates, labels = [], [], [], []
        while len(canvases) < args.batch:
            # --hard: 50/50 easy/hard canvases (truncation, motion blur,
            # lighting extremes, distractor-car background) — the armor
            # stage's share of the hard-tier gap; car-car plate occlusion
            # stays eval-only (single-car canvases have no occluders).
            arena = bool(
                getattr(args, "arena", False) and rng.random() < 0.5
            )
            s = make_scene(
                rng,
                ARMOR_CANVAS,
                ARMOR_CANVAS,
                car_size=(120, 640) if arena else (180, 640),
                n_cars=1,
                hard=bool(
                    getattr(args, "hard", False) and rng.random() < 0.5
                ),
                arena=arena,
            )
            if len(s.car_xywh) != 1:
                continue
            box = s.car_xywh[0].copy()
            jx = rng.uniform(-0.06, 0.06, size=4) * np.array(
                [box[2], box[3], box[2], box[3]]
            )
            box = box + jx.astype(np.float32)
            box[0] = np.clip(box[0], 0, ARMOR_CANVAS - 2)
            box[1] = np.clip(box[1], 0, ARMOR_CANVAS - 2)
            box[2] = np.clip(box[2], 8, ARMOR_CANVAS - box[0])
            box[3] = np.clip(box[3], 8, ARMOR_CANVAS - box[1])
            canvases.append(s.image)
            crops.append(box)
            plates.append(s.armor_xywh[0])
            labels.append(s.armor_label[0])
        imgs = jax.device_put(np.stack(canvases))
        boxes = jnp.asarray(np.stack(crops))
        blobs, pparams = crop_fn(imgs, boxes)
        pp = jax.device_get(pparams)

        xywh = np.zeros((args.batch, capacity, 4), np.float32)
        label = np.zeros((args.batch, capacity), np.int32)
        valid = np.zeros((args.batch, capacity), bool)
        for i in range(args.batch):
            # crop origin truncates like the reference cv::Rect
            # (detector.cpp:417-424 via letterbox_crop's int cast)
            ox, oy = float(int(crops[i][0])), float(int(crops[i][1]))
            cw, ch = float(int(crops[i][2])), float(int(crops[i][3]))
            px, py, pw, ph = (float(v) for v in plates[i])
            # clip the plate to the crop; keep if >= half the area survives
            cx0, cy0 = max(px, ox), max(py, oy)
            cx1 = min(px + pw, ox + cw)
            cy1 = min(py + ph, oy + ch)
            if (cx1 - cx0) * (cy1 - cy0) < 0.5 * pw * ph:
                continue
            t = _transform_boxes(
                np.asarray([[cx0, cy0, cx1 - cx0, cy1 - cy0]], np.float32),
                np.asarray([True]),
                pp.ratio[i],
                pp.dw[i],
                pp.dh[i],
                origin=(ox, oy),
            )
            xywh[i, 0] = t[0]
            label[i, 0] = labels[i]
            valid[i, 0] = True
        batches.append(
            (
                blobs,
                jax.device_put(
                    DetectionTargets(
                        xywh=jnp.asarray(xywh),
                        label=jnp.asarray(label),
                        valid=jnp.asarray(valid),
                    )
                ),
            )
        )
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["car", "armor"], required=True)
    ap.add_argument("--variant", default="n")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--armor-small", type=int, default=0,
                    help="optional second armor input size trained in "
                    "alternation (0 = single-size; separate per-size "
                    "checkpoints measured more accurate than one shared-BN "
                    "multi-scale checkpoint — the reference likewise builds "
                    "one TensorRT engine per input shape)")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-batches", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="assets/models")
    ap.add_argument("--ckpt-dir", default="",
                    help="orbax checkpoint directory: saves the full "
                    "TrainState every --ckpt-every steps and resumes from "
                    "the latest checkpoint on restart (pod-preemption "
                    "recovery; train/checkpoint.py)")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="parameter-EMA decay (e.g. 0.999): the saved "
                    "checkpoint then holds the EMA weights, as Ultralytics "
                    "evaluates/exports its EMA model. 0 = raw weights. "
                    "With --ckpt-dir the EMA tree is checkpointed alongside "
                    "the TrainState, so a resumed run keeps the accumulated "
                    "average (checkpoints written with a different --ema "
                    "on/off setting are structurally incompatible).")
    ap.add_argument("--hard", action="store_true",
                    help="50/50 easy/hard training mix. Car stage: full "
                    "hard scenes (occlusion, edge truncation, motion blur, "
                    "lighting extremes, armor-less distractor cars as "
                    "explicit negatives). Armor stage: hard single-car "
                    "canvases (truncation/blur/lighting/distractor "
                    "background; car-car plate occlusion stays eval-only). "
                    "See PERF.md hard-tier sections.")
    ap.add_argument("--arena", action="store_true",
                    help="mix in 50% real-domain arena-style scenes (dark "
                    "textured arena, glow-rendered robots, photometric "
                    "camera model, small real-scale cars) — the domain "
                    "randomization behind the real-frame eval tier "
                    "(tools/eval_real.py, assets/labels/real_frames.json)")
    ap.add_argument("--suffix", default="",
                    help="extra suffix for the saved checkpoint name (e.g. "
                    "'_r4' to avoid overwriting shipped evidence until the "
                    "candidate is evaluated)")
    ap.add_argument("--assigner", choices=["center", "tal"], default="center",
                    help="anchor assignment in the loss: 'center' (closest-"
                    "center-inside-box) or 'tal' (Ultralytics task-aligned "
                    "assignment, train/loss.py)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache")
        or None,
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from rm_radar_tpu.models.weights import save_variables
    from rm_radar_tpu.models.yolov8 import create_model, init_params
    from rm_radar_tpu.train.train_step import create_train_state, train_step

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    num_classes = 1 if args.stage == "car" else 12
    model, cfg = create_model(
        variant=args.variant,
        num_classes=num_classes,
        input_size=(args.size, args.size),
        dtype=jnp.float32,
    )
    variables = init_params(model, jax.random.PRNGKey(args.seed))

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    if args.stage == "car":
        batch_sets = [stage_car_batches(args, jax, jnp, rng)]
        models = [model]
    elif not args.armor_small:
        batch_sets = [stage_armor_batches(args, jax, jnp, rng, args.size)]
        models = [model]
    else:
        n_total = args.n_batches
        args.n_batches = (n_total + 1) // 2
        big = stage_armor_batches(args, jax, jnp, rng, args.size)
        small = stage_armor_batches(args, jax, jnp, rng, args.armor_small)
        batch_sets = [big, small]
        # Same variant/classes => identical parameter tree; only the anchor
        # grid (from input_size) differs, so both steps share one state.
        small_model, _ = create_model(
            variant=args.variant,
            num_classes=num_classes,
            input_size=(args.armor_small, args.armor_small),
            dtype=jnp.float32,
        )
        models = [model, small_model]
    jax.block_until_ready([b[0] for bs in batch_sets for b in bs])
    print(
        f"staged+preprocessed {sum(len(b) for b in batch_sets)}x{args.batch} "
        f"blobs in {time.time() - t0:.0f}s",
        file=sys.stderr,
        flush=True,
    )

    warmup = min(100, max(args.steps // 10, 1))
    tx = optax.adam(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps + warmup
        )
    )
    state = create_train_state(model, variables, tx)

    mgr = None
    start_step = 1
    restored_ema = None
    if args.ckpt_dir:
        from rm_radar_tpu.train import checkpoint as ckpt

        mgr = ckpt.make_manager(args.ckpt_dir)
        # Checkpoint pytree includes the EMA params when EMA is on, so a
        # resumed run keeps the accumulated average instead of re-seeding
        # it from the restored raw params.
        template = {"state": state}
        if args.ema > 0.0:
            template["ema"] = state.params
        restored = ckpt.restore_latest(mgr, template)
        if restored is not None:
            state = restored["state"]
            restored_ema = restored.get("ema")
            # A checkpoint saved at loop index i holds state.step == i+1
            # (the loop's pre-step invariant is state.step == i), so the
            # first un-executed index IS int(state.step) — no +1.
            start_step = int(state.step)
            print(f"resumed at step {start_step}", file=sys.stderr, flush=True)

    steps = []
    for m in models:
        steps.append(
            jax.jit(
                (lambda mm: lambda s, b, t: train_step(
                    s, b, t, model=mm, tx=tx, assigner=args.assigner))(m),
                donate_argnums=(0,),
            )
        )

    t0 = time.time()
    if start_step == 1:  # resumed runs compile inside the loop instead —
        # an unconditional extra step here would advance the restored state
        # off-schedule by one step per preemption.
        state, metrics = steps[0](state, *batch_sets[0][0])
        print(
            f"compile+first step: {time.time() - t0:.0f}s "
            f"loss={float(metrics['loss']):.3f}",
            file=sys.stderr,
            flush=True,
        )
    ema_params = None
    ema_step = None
    if args.ema > 0.0:
        import functools

        from rm_radar_tpu.train.train_step import ema_update

        # Real buffer copies: the train step donates its input state, so
        # aliasing state.params here would leave EMA holding deleted arrays.
        # A restored EMA tree is already distinct buffers (fresh from orbax)
        # but copy anyway for uniform donation-safety.
        ema_params = jax.tree_util.tree_map(
            jnp.copy,
            restored_ema if restored_ema is not None else state.params,
        )
        ema_step = jax.jit(
            functools.partial(ema_update, decay=args.ema)
        )

    t0 = time.time()
    for i in range(start_step, args.steps):
        k = i % len(batch_sets)
        bs = batch_sets[k]
        state, metrics = steps[k](state, *bs[(i // len(batch_sets)) % len(bs)])
        if ema_step is not None:
            ema_params = ema_step(ema_params, state.params)
        if mgr is not None and i % args.ckpt_every == 0:
            from rm_radar_tpu.train import checkpoint as ckpt

            tree = {"state": state}
            if ema_params is not None:
                tree["ema"] = ema_params
            ckpt.save(mgr, i, tree)  # async; training continues
        if i % 400 == 0 or i == args.steps - 1:
            m = jax.device_get(metrics)
            print(
                f"step {i}: loss={float(m['loss']):.3f} "
                f"box={float(m['box_loss']):.3f} cls={float(m['cls_loss']):.3f} "
                f"dfl={float(m['dfl_loss']):.3f} ({(time.time() - t0) / i * 1e3:.0f} ms/step)",
                file=sys.stderr,
                flush=True,
            )

    os.makedirs(args.out, exist_ok=True)
    suffix = ("" if args.size == 640 else f"_{args.size}") + args.suffix
    path = os.path.join(
        args.out, f"{args.stage}_synth_{args.variant}{suffix}.npz"
    )
    save_variables(
        path,
        {
            "params": ema_params if ema_params is not None else state.params,
            "batch_stats": state.batch_stats,
        },
    )
    print(f"saved {path}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

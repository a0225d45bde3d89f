#!/usr/bin/env python
"""Finetune the ARMOR classifier on the bundled real match frames.

Why this exists: the cascade's same-label dedup (reference
detector.cpp:431-450 — one robot survives per armor label) assumes the
armor classifier is right. Round-5 measurement: the synthetic-trained armor
model localizes real plates well (armor_detected_rate 0.875) but labels
them near-randomly (label_accuracy 0.0), so distinct robots collide on
labels and the dedup silently drops most of the frame — cascade recall
0.23 while the car stage alone finds every annotated robot (PERF.md
round-5 real-frame section).

Supervision comes from the hand annotations the honest way the data
allows — the 50 legible plate labels in assets/labels/real_frames.json are
CAR-level identity labels, with no plate boxes. Plates are therefore
pseudo-localized: the synthetic armor detector runs on each annotated car
crop and its top box becomes the regression target, carrying the
annotated identity as the class target (its localization transfers; only
its classification is wrong). Same few-shot protocol as tools/
train_real.py: train split frames 0-4, eval held-out 5-9 via
tools/eval_real.py --tiled --armor-npz <out>; 50/50 synthetic mix keeps
the synthetic-domain behavior.

No horizontal flips on real crops: plate glyphs are digits — a mirrored
"3" is not a 3 (the synthetic mix keeps its own augmentation policy).

Usage:
  python tools/train_armor_real.py --variant m --size 256 --steps 1500
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_synth import _transform_boxes  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 768  # host-side square window around each car (cars are <= ~180 px)
CAPACITY = 2  # plate target slots per crop


def load_labeled_cars(image_dir: str, frame_ids):
    """-> list of (window uint8 [WINDOW, WINDOW, 3] BGR, car_xywh in window
    coords, identity label int)."""
    from PIL import Image

    labels = json.load(
        open(os.path.join(REPO, "assets/labels/real_frames.json"))
    )
    out = []
    for name, boxes in sorted(labels["frames"].items()):
        fid = int(os.path.splitext(name)[0])
        if fid not in frame_ids:
            continue
        rgb = np.asarray(
            Image.open(os.path.join(image_dir, name)).convert("RGB")
        )
        bgr = np.ascontiguousarray(rgb[..., ::-1])
        H, W = bgr.shape[:2]
        for b in boxes:
            if b["ignore"] or b.get("label") is None:
                continue
            x, y, w, h = b["xywh"]
            wx = int(np.clip(x + w / 2 - WINDOW / 2, 0, W - WINDOW))
            wy = int(np.clip(y + h / 2 - WINDOW / 2, 0, H - WINDOW))
            win = np.ascontiguousarray(
                bgr[wy : wy + WINDOW, wx : wx + WINDOW]
            )
            car = np.asarray([x - wx, y - wy, w, h], np.float32)
            out.append((win, car, int(b["label"])))
    if not out:
        raise SystemExit(f"no labeled cars in frames {sorted(frame_ids)}")
    return out


def pseudo_localize_plates(cars, variant, size, armor_npz, jax, jnp):
    """Run the synthetic armor detector on each annotated car crop; its
    top-confidence box (crop-local coordinates) is the plate's regression
    target. Returns list of (window, car_xywh, plate_xywh_imgcoords, label);
    cars with no detected plate are dropped (reported)."""
    from rm_radar_tpu.models.weights import load_variables
    from rm_radar_tpu.models.yolov8 import create_model
    from rm_radar_tpu.ops.detect_ops import postprocess
    from rm_radar_tpu.ops.preprocess import letterbox_crop

    model, _ = create_model(
        variant=variant,
        num_classes=12,
        input_size=(size, size),
        dtype=jnp.float32,
    )
    variables = load_variables(armor_npz)

    @jax.jit
    def detect_crop(window, box):
        blob, pp = letterbox_crop(
            window, box, dst_height=size, dst_width=size
        )
        raw = model.apply(variables, blob[None])[0]
        return postprocess(raw, pp, 0.65, 0.25, 512, 4)

    kept, dropped = [], 0
    for win, car, label in cars:
        d = jax.device_get(detect_crop(jnp.asarray(win), jnp.asarray(car)))
        best, best_conf = None, 0.0
        for i in range(len(d.valid)):
            if d.valid[i] and float(d.confidence[i]) > best_conf:
                best_conf = float(d.confidence[i])
                best = np.asarray(d.xywh[i], np.float32)
        if best is None:
            dropped += 1
            continue
        # postprocess restores to crop-local coords (origin = int car box);
        # shift to window coords for crop-jitter-safe staging.
        plate = best + np.asarray(
            [int(car[0]), int(car[1]), 0, 0], np.float32
        )
        kept.append((win, car, plate, label))
    print(
        f"pseudo-localized {len(kept)} plates ({dropped} cars dropped: no "
        "plate detection)",
        file=sys.stderr, flush=True,
    )
    return kept


def stage_batches(args, jax, jnp, rng, samples):
    """50/50 real/synthetic (window, car box, plate, label) -> fused
    crop+letterbox blobs + DetectionTargets, exactly the cascade's armor
    input path (ops/preprocess.letterbox_crop)."""
    from rm_radar_tpu.ops.preprocess import letterbox_crop
    from rm_radar_tpu.train.loss import DetectionTargets
    from rm_radar_tpu.train.synth import make_scene

    t = args.size
    crop_fn = jax.jit(
        jax.vmap(
            functools.partial(letterbox_crop, dst_height=t, dst_width=t)
        )
    )
    batches = []
    for _ in range(args.n_batches):
        windows = np.zeros((args.batch, WINDOW, WINDOW, 3), np.uint8)
        boxes = np.zeros((args.batch, 4), np.float32)
        plates = np.zeros((args.batch, 4), np.float32)
        labels = np.zeros((args.batch,), np.int32)
        has_plate = np.zeros((args.batch,), bool)
        for i in range(args.batch):
            if rng.random() < args.synth_frac:
                s = make_scene(
                    rng, WINDOW, WINDOW, n_cars=1,
                    car_size=(120, 640),
                    hard=rng.random() < 0.5,
                    arena=rng.random() < 0.5,
                )
                if len(s.car_xywh) != 1:
                    continue
                windows[i] = s.image
                boxes[i] = s.car_xywh[0]
                plates[i] = s.armor_xywh[0]
                labels[i] = s.armor_label[0]
                has_plate[i] = True
            else:
                win, car, plate, label = samples[
                    int(rng.integers(len(samples)))
                ]
                w = win.astype(np.float32)
                # Photometric augmentation (same family as train_real).
                gamma = float(rng.uniform(0.7, 1.4))
                w = 255.0 * (w / 255.0) ** gamma
                w = w * float(rng.uniform(0.85, 1.15)) + float(
                    rng.uniform(-10, 10)
                )
                w = w * rng.uniform(0.94, 1.06, size=3).astype(np.float32)
                w = w + rng.normal(0, float(rng.uniform(0, 4)), w.shape)
                windows[i] = np.clip(w, 0, 255).astype(np.uint8)
                boxes[i] = car
                plates[i] = plate
                labels[i] = label
                has_plate[i] = True
            # Crop-box jitter (+-6%), the detector-localization-error model
            # stage_armor_batches uses; plates clipped below half visibility
            # are dropped from the targets below.
            b = boxes[i]
            jx = rng.uniform(-0.06, 0.06, size=4) * np.array(
                [b[2], b[3], b[2], b[3]]
            )
            b = b + jx.astype(np.float32)
            b[0] = np.clip(b[0], 0, WINDOW - 2)
            b[1] = np.clip(b[1], 0, WINDOW - 2)
            b[2] = np.clip(b[2], 8, WINDOW - b[0])
            b[3] = np.clip(b[3], 8, WINDOW - b[1])
            boxes[i] = b
        blobs, pparams = crop_fn(
            jax.device_put(windows), jnp.asarray(boxes)
        )
        pp = jax.device_get(pparams)
        xywh = np.zeros((args.batch, CAPACITY, 4), np.float32)
        label_arr = np.zeros((args.batch, CAPACITY), np.int32)
        valid = np.zeros((args.batch, CAPACITY), bool)
        for i in range(args.batch):
            if not has_plate[i]:
                continue
            ox, oy = float(int(boxes[i][0])), float(int(boxes[i][1]))
            cw, ch = float(int(boxes[i][2])), float(int(boxes[i][3]))
            px, py, pw, ph = (float(v) for v in plates[i])
            cx0, cy0 = max(px, ox), max(py, oy)
            cx1 = min(px + pw, ox + cw)
            cy1 = min(py + ph, oy + ch)
            if (cx1 - cx0) * (cy1 - cy0) < 0.5 * pw * ph:
                continue
            tb = _transform_boxes(
                np.asarray([[cx0, cy0, cx1 - cx0, cy1 - cy0]], np.float32),
                np.asarray([True]),
                pp.ratio[i],
                pp.dw[i],
                pp.dh[i],
                origin=(ox, oy),
            )
            xywh[i, 0] = tb[0]
            label_arr[i, 0] = labels[i]
            valid[i, 0] = True
        batches.append(
            (
                blobs,
                jax.device_put(
                    DetectionTargets(
                        xywh=jnp.asarray(xywh),
                        label=jnp.asarray(label_arr),
                        valid=jnp.asarray(valid),
                    )
                ),
            )
        )
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="m")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--init", default="",
                    help=".npz armor checkpoint to warm-start from (default "
                    "assets/models/armor_synth_{variant}_{size}_r4.npz)")
    ap.add_argument("--train-frames", default="0,1,2,3,4")
    ap.add_argument("--images", default="/root/reference/assets/images")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-batches", type=int, default=48)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--synth-frac", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="assets/models")
    ap.add_argument("--name", default="",
                    help="output filename (default "
                    "armor_real_{variant}_{size}.npz)")
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

    from rm_radar_tpu.models.weights import load_variables, save_variables
    from rm_radar_tpu.models.yolov8 import create_model
    from rm_radar_tpu.train.train_step import (
        create_train_state,
        ema_update,
        train_step,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    train_ids = {int(x) for x in args.train_frames.split(",")}
    cars = load_labeled_cars(args.images, train_ids)
    print(
        f"train frames {sorted(train_ids)}: {len(cars)} labeled cars",
        file=sys.stderr, flush=True,
    )
    init = args.init or os.path.join(
        "assets/models", f"armor_synth_{args.variant}_{args.size}_r4.npz"
    )
    samples = pseudo_localize_plates(
        cars, args.variant, args.size, init, jax, jnp
    )

    model, _ = create_model(
        variant=args.variant,
        num_classes=12,
        input_size=(args.size, args.size),
        dtype=jnp.float32,
    )
    variables = load_variables(init)
    print(f"warm start: {init}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(args.seed + 2)
    t0 = time.time()
    batches = stage_batches(args, jax, jnp, rng, samples)
    jax.block_until_ready([b[0] for b in batches])
    print(
        f"staged {len(batches)}x{args.batch} blobs in {time.time() - t0:.0f}s",
        file=sys.stderr, flush=True,
    )

    warmup = min(100, max(args.steps // 10, 1))
    tx = optax.adam(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps + warmup
        )
    )
    state = create_train_state(model, variables, tx)
    step = jax.jit(
        lambda s, b, t: train_step(s, b, t, model=model, tx=tx),
        donate_argnums=(0,),
    )
    ema_params = jax.tree_util.tree_map(jnp.copy, state.params)
    ema_step = jax.jit(functools.partial(ema_update, decay=args.ema))

    t0 = time.time()
    state, metrics = step(state, *batches[0])
    print(
        f"compile+first step: {time.time() - t0:.0f}s "
        f"loss={float(metrics['loss']):.3f}",
        file=sys.stderr, flush=True,
    )
    t0 = time.time()
    for i in range(1, args.steps):
        state, metrics = step(state, *batches[i % len(batches)])
        if args.ema > 0:
            ema_params = ema_step(ema_params, state.params)
        if i % 200 == 0 or i == args.steps - 1:
            m = jax.device_get(metrics)
            print(
                f"step {i}: loss={float(m['loss']):.3f} "
                f"box={float(m['box_loss']):.3f} "
                f"cls={float(m['cls_loss']):.3f} "
                f"({(time.time() - t0) / i * 1e3:.0f} ms/step)",
                file=sys.stderr, flush=True,
            )

    os.makedirs(args.out, exist_ok=True)
    name = args.name or f"armor_real_{args.variant}_{args.size}.npz"
    out = os.path.join(args.out, name)
    final = ema_params if args.ema > 0 else state.params
    save_variables(
        out,
        {
            "params": jax.device_get(final),
            "batch_stats": jax.device_get(state.batch_stats),
        },
    )
    print(f"saved {out}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Finetune the car detector on the bundled REAL match frames (tile scale).

The reference's shipped model is trained on real match data (its README
claims 83.66% season marking accuracy on real footage); this repo's
checkpoints are synthetic-only. This tool closes the domain gap the honest
way the data allows: finetune on a declared TRAIN SPLIT of the 10 bundled
frames (default 0-4) and evaluate on the held-out frames (5-9) with
``tools/eval_real.py --tiled --frames 5,6,7,8,9``.

HONESTY CAVEAT (also in PERF.md): the 10 frames are consecutive ~100 ms
frames of ONE match sequence (samples/main.cpp:74-99) — the held-out frames
show the same 8 robots in nearly the same poses/lighting as the train
frames. A held-out-frames number is therefore evidence of *few-shot
adaptation to a specific camera/arena* (exactly how a team would calibrate
at a venue), NOT of open-world generalization. The zero-shot synthetic-only
number is reported alongside it.

Training operates at TILE scale: 512x512 native-resolution windows sampled
around ground-truth boxes (plus random-negative tiles) from the train
frames, mixed 50/50 with synthetic arena scenes at the same scale so the
synthetic-domain behavior is retained. Inference-side equivalent:
``RobotDetector.detect_tiled`` (detect/detector.py).

Usage:
  python tools/train_real.py --variant m --size 512 \
      --init assets/models/car_synth_m_512_r4.npz --steps 1500
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_synth import _transform_boxes  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPACITY = 8  # target slots per tile
IGN_CAP = 2  # ignore-region slots per tile (one ambiguous cluster per frame)


def load_real_frames(image_dir: str, frame_ids):
    from PIL import Image

    labels = json.load(
        open(os.path.join(REPO, "assets/labels/real_frames.json"))
    )
    frames = []
    for name, boxes in sorted(labels["frames"].items()):
        fid = int(os.path.splitext(name)[0])
        if fid not in frame_ids:
            continue
        rgb = np.asarray(
            Image.open(os.path.join(image_dir, name)).convert("RGB")
        )
        bgr = np.ascontiguousarray(rgb[..., ::-1])
        # ignore boxes participate as "do not sample a tile cutting them":
        # they carry no target but must not be labeled background either.
        frames.append((bgr, [b for b in boxes if not b["ignore"]],
                       [b for b in boxes if b["ignore"]]))
    if not frames:
        raise SystemExit(f"no frames matched ids {sorted(frame_ids)}")
    return frames


def _boxes_in_tile(boxes, tx, ty, t):
    """-> (fully_inside list, any_partial bool). A box is 'inside' with an
    8 px margin (the inference-side border suppression drops detections
    within 8 px of interior tile edges, so training never labels them)."""
    inside, partial = [], False
    for b in boxes:
        x, y, w, h = b["xywh"]
        ix = min(x + w, tx + t) - max(x, tx)
        iy = min(y + h, ty + t) - max(y, ty)
        if ix <= 0 or iy <= 0:
            continue
        if (
            x >= tx + 8 and y >= ty + 8
            and x + w <= tx + t - 8 and y + h <= ty + t - 8
        ):
            inside.append((x - tx, y - ty, w, h))
        else:
            partial = True
    return inside, partial


def sample_real_tile(rng, frames, t: int, anchored: float = 0.75):
    """One augmented (tile, boxes, ignore_boxes) triple from the train
    frames. Tiles that CUT a gt or ignore box are rejected (never label a
    cut robot as background); tiles containing a whole ignore region are
    kept and return it, so the loss can exclude its anchors from the
    negative supervision (train/loss.py iscrowd masking) — without this,
    windows around the ambiguous cluster are unsampleable and everything
    near it (the arena's central structure) goes untrained as background."""
    for _ in range(60):
        img, gts, igns = frames[int(rng.integers(len(frames)))]
        H, W = img.shape[:2]
        # Scale jitter: crop an s*t source window, resize to t.
        s = float(rng.uniform(0.75, 1.35))
        src = min(int(round(t * s)), H, W)
        if rng.random() < anchored and gts:  # anchored at a random GT
            g = gts[int(rng.integers(len(gts)))]["xywh"]
            lo_x = max(g[0] + g[2] + 16 - src, 0)
            hi_x = min(g[0] - 16, W - src)
            lo_y = max(g[1] + g[3] + 16 - src, 0)
            hi_y = min(g[1] - 16, H - src)
            if hi_x < lo_x or hi_y < lo_y:
                continue
            tx = int(rng.integers(lo_x, hi_x + 1))
            ty = int(rng.integers(lo_y, hi_y + 1))
        else:  # random-negative (or whatever it contains)
            tx = int(rng.integers(0, W - src + 1))
            ty = int(rng.integers(0, H - src + 1))
        inside, partial = _boxes_in_tile(gts, tx, ty, src)
        ign_inside, ign_partial = _boxes_in_tile(igns, tx, ty, src)
        if partial or ign_partial:
            continue  # never label a cut robot as background
        tile = img[ty : ty + src, tx : tx + src]
        boxes = np.asarray(inside, np.float32).reshape(-1, 4)
        ign_boxes = np.asarray(ign_inside, np.float32).reshape(-1, 4)
        if src != t:
            from PIL import Image

            tile = np.asarray(
                Image.fromarray(tile).resize((t, t), Image.BILINEAR)
            )
            boxes = boxes * (t / src)
            ign_boxes = ign_boxes * (t / src)
        tile = tile.astype(np.float32)
        # Photometric augmentation (BGR; the camera model the synth arena
        # domain also samples): gamma, gain/bias, per-channel gain, noise.
        gamma = float(rng.uniform(0.65, 1.5))
        tile = 255.0 * (tile / 255.0) ** gamma
        tile = tile * float(rng.uniform(0.8, 1.2)) + float(rng.uniform(-12, 12))
        tile = tile * rng.uniform(0.92, 1.08, size=3).astype(np.float32)
        tile = tile + rng.normal(0, float(rng.uniform(0, 5)), tile.shape)
        tile = np.clip(tile, 0, 255).astype(np.uint8)
        if rng.random() < 0.5:  # horizontal flip
            tile = tile[:, ::-1]
            if len(boxes):
                boxes[:, 0] = t - boxes[:, 0] - boxes[:, 2]
            if len(ign_boxes):
                ign_boxes[:, 0] = t - ign_boxes[:, 0] - ign_boxes[:, 2]
        return np.ascontiguousarray(tile), boxes, ign_boxes
    raise RuntimeError("tile rejection sampling failed 60 times")


def stage_batches(args, jax, jnp, rng, frames):
    from rm_radar_tpu.ops.preprocess import letterbox_batch
    from rm_radar_tpu.train.loss import DetectionTargets
    from rm_radar_tpu.train.synth import make_scene

    t = args.size
    letterbox = jax.jit(lambda imgs: letterbox_batch(imgs, t, t))
    batches = []
    for _ in range(args.n_batches):
        tiles = np.zeros((args.batch, t, t, 3), np.uint8)
        xywh = np.zeros((args.batch, CAPACITY, 4), np.float32)
        valid = np.zeros((args.batch, CAPACITY), bool)
        ign_xywh = np.zeros((args.batch, IGN_CAP, 4), np.float32)
        ign_valid = np.zeros((args.batch, IGN_CAP), bool)
        for i in range(args.batch):
            if rng.random() < args.synth_frac:
                sc = make_scene(
                    rng, t, t, max_cars=4, car_size=(40, 170),
                    hard=rng.random() < 0.5, arena=True,
                )
                tiles[i] = sc.image
                n = min(len(sc.car_xywh), CAPACITY)
                if n:
                    xywh[i, :n] = sc.car_xywh[:n]
                    valid[i, :n] = True
            else:
                tile, boxes, ign_boxes = sample_real_tile(
                    rng, frames, t, anchored=args.anchored
                )
                tiles[i] = tile
                n = min(len(boxes), CAPACITY)
                if n:
                    xywh[i, :n] = boxes[:n]
                    valid[i, :n] = True
                k = min(len(ign_boxes), IGN_CAP)
                if k:
                    ign_xywh[i, :k] = ign_boxes[:k]
                    ign_valid[i, :k] = True
        blobs, pparams = letterbox(jax.device_put(tiles))
        pp = jax.device_get(pparams)
        t_xywh = _transform_boxes(
            xywh, valid, pp.ratio[:, None], pp.dw[:, None], pp.dh[:, None]
        )
        t_ign = _transform_boxes(
            ign_xywh, ign_valid,
            pp.ratio[:, None], pp.dw[:, None], pp.dh[:, None],
        )
        batches.append(
            (
                blobs,
                jax.device_put(
                    DetectionTargets(
                        xywh=jnp.asarray(t_xywh),
                        label=jnp.zeros((args.batch, CAPACITY), jnp.int32),
                        valid=jnp.asarray(valid),
                        ignore_xywh=jnp.asarray(t_ign),
                        ignore_valid=jnp.asarray(ign_valid),
                    )
                ),
            )
        )
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="m")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--init", default="",
                    help=".npz checkpoint to warm-start from (default: the "
                    "size-matched synthetic car checkpoint)")
    ap.add_argument("--train-frames", default="0,1,2,3,4",
                    help="comma-separated frame ids used for training; "
                    "everything else is the held-out eval split")
    ap.add_argument("--images", default="/root/reference/assets/images")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--assigner", choices=["center", "tal"], default="center",
                    help="anchor assignment in the loss (train/loss.py); "
                    "'tal' sharpens box extents on crowded/adjacent robots "
                    "(the group-box failure mode PERF.md round 5 measures)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-batches", type=int, default=48)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--synth-frac", type=float, default=0.5)
    ap.add_argument("--anchored", type=float, default=0.75,
                    help="fraction of real tiles anchored at a GT box; the "
                    "rest are random windows (background negatives)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="assets/models")
    ap.add_argument("--name", default="",
                    help="output checkpoint filename (default "
                    "car_real_{variant}_{size}.npz)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/rm_radar_jax_cache")
        or None,
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import functools

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
    frames = load_real_frames(args.images, train_ids)
    n_boxes = sum(len(g) for _, g, _ in frames)
    print(
        f"train frames {sorted(train_ids)}: {n_boxes} boxes",
        file=sys.stderr, flush=True,
    )

    model, cfg = create_model(
        variant=args.variant,
        num_classes=1,
        input_size=(args.size, args.size),
        dtype=jnp.float32,
    )
    init = args.init or os.path.join(
        args.out, f"car_synth_{args.variant}_{args.size}_r4.npz"
    )
    variables = load_variables(init)
    print(f"warm start: {init}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    batches = stage_batches(args, jax, jnp, rng, frames)
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
        lambda s, b, t: train_step(
            s, b, t, model=model, tx=tx, assigner=args.assigner
        ),
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
    name = args.name or f"car_real_{args.variant}_{args.size}.npz"
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

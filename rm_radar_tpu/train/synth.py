"""Synthetic RoboMaster-like scene generator: training data + accuracy
evidence without the reference's (absent) car.onnx/armor.onnx weights.

The reference's product is *accuracy* — 83.66% season marking accuracy
(reference README.md:25) from a two-stage cascade fed by real checkpoints
(detector.cpp:74-99). The original weight blobs are not in the snapshot
(.MISSING_LARGE_BLOBS), so this module generates procedurally labeled
RoboMaster-style scenes — field-gray backgrounds, dark car bodies, armor
plates with team-colored light bars and white number glyphs — on which the
framework's own train/ stack learns real car and armor detectors. The
resulting weights drive end-to-end accuracy tests (tests/test_accuracy_synth)
and the armor-input-size accuracy/speed trade measurements (PERF.md).

Scene conventions follow the reference pipeline: images are uint8 HWC **BGR**
(cv::imread order, samples/main.cpp), cars are axis-aligned boxes, armor
labels use the 12-class Label enum (robot.h:32-45): blue/red x
{hero=1, engineer=2, infantry 3/4/5} + sentry, rendered as the plate's glyph.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

# 5x7 binary glyphs: RoboMaster plate numbers 1-5 plus 'S' (sentry).
_GLYPHS = {
    "1": ("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    "2": ("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    "3": ("11110", "00001", "00001", "01110", "00001", "00001", "11110"),
    "4": ("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    "5": ("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    "S": ("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
}

# Label (robot.h:32-45) -> glyph character. 0-4 blue, 5-9 red, 10/11 sentry.
_LABEL_GLYPH = {
    0: "1", 1: "2", 2: "3", 3: "4", 4: "5",
    5: "1", 6: "2", 7: "3", 8: "4", 9: "5",
    10: "S", 11: "S",
}

# Team light-bar colors in BGR (blue team: labels 0-4 and 10).
_BLUE = np.array([255, 80, 40], np.uint8)
_RED = np.array([40, 60, 255], np.uint8)


def label_is_blue(label: int) -> bool:
    return label <= 4 or label == 10


class Scene(NamedTuple):
    """One labeled scene (all boxes xywh float32 in image pixels)."""

    image: np.ndarray  # [H, W, 3] uint8 BGR
    car_xywh: np.ndarray  # [N, 4]
    armor_xywh: np.ndarray  # [M, 4]
    armor_label: np.ndarray  # [M] int32
    armor_car: np.ndarray  # [M] int32 index into car_xywh
    # Fraction of each armor plate still visible after occlusion by
    # later-drawn cars (1.0 in easy scenes). Hard-scene evals use it to
    # report label accuracy on visible plates separately.
    armor_visible: np.ndarray = np.zeros(0, np.float32)  # [M]


def _background(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Field-gray floor: coarse tonal patches + faint lane lines + noise."""
    coarse = rng.integers(70, 150, size=(-(-h // 64), -(-w // 64)))
    base = np.kron(coarse, np.ones((64, 64)))[:h, :w]
    img = np.repeat(base[:, :, None], 3, axis=2).astype(np.float32)
    for _ in range(rng.integers(2, 6)):  # lane markings
        if rng.random() < 0.5:
            y = int(rng.integers(0, h))
            t = int(rng.integers(2, 6))
            img[y : y + t, :] = rng.integers(160, 230)
        else:
            x = int(rng.integers(0, w))
            t = int(rng.integers(2, 6))
            img[:, x : x + t] = rng.integers(160, 230)
    img += rng.normal(0, 6, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _draw_glyph(
    img: np.ndarray, x0: int, y0: int, gw: int, gh: int, glyph: str,
    color=235,
) -> None:
    """5x7 glyph block-scaled into [y0:y0+gh, x0:x0+gw]. ``color`` is a
    scalar (white, the flat domain / floor markings) or a BGR triple (the
    arena domain's LED digits glow in team color — the real frames'
    plates are lit digits, and digit color vs white is exactly what
    separates a robot plate from painted floor text)."""
    rows = _GLYPHS[glyph]
    cell_h = max(gh // 7, 1)
    cell_w = max(gw // 5, 1)
    for r, row in enumerate(rows):
        for c, bit in enumerate(row):
            if bit == "1":
                ys = y0 + r * cell_h
                xs = x0 + c * cell_w
                img[ys : ys + cell_h, xs : xs + cell_w] = color


def _draw_glyph_mask(
    mask: np.ndarray, x0: int, y0: int, gw: int, gh: int, glyph: str
) -> None:
    """Like :func:`_draw_glyph` but sets True in a [H, W] bool mask
    (clipped at the edges) — used for alpha-blended floor markings."""
    h, w = mask.shape
    rows = _GLYPHS[glyph]
    cell_h = max(gh // 7, 1)
    cell_w = max(gw // 5, 1)
    for r, row in enumerate(rows):
        for c, bit in enumerate(row):
            if bit == "1":
                ys = y0 + r * cell_h
                xs = x0 + c * cell_w
                mask[
                    max(ys, 0) : min(ys + cell_h, h),
                    max(xs, 0) : min(xs + cell_w, w),
                ] = True


def _draw_car(
    img: np.ndarray, rng: np.random.Generator, box: Tuple[int, int, int, int],
    label: int,
) -> Tuple[int, int, int, int]:
    """Draw a car body + one armor plate; returns the armor plate xywh."""
    x, y, w, h = box
    body = int(rng.integers(30, 75))
    img[y : y + h, x : x + w] = body
    # wheels: darker strip along the bottom
    wh = max(h // 6, 2)
    img[y + h - wh : y + h, x : x + w] = max(body - 20, 8)
    # top deck highlight
    img[y : y + max(h // 10, 1), x : x + w] = min(body + 25, 255)

    # Armor plate: dark face, team light bars at the sides, white glyph.
    pw = int(w * rng.uniform(0.38, 0.55))
    ph = int(h * rng.uniform(0.30, 0.42))
    pw, ph = max(pw, 10), max(ph, 10)
    px = x + int((w - pw) * rng.uniform(0.25, 0.75))
    py = y + int((h - ph) * rng.uniform(0.45, 0.85))
    img[py : py + ph, px : px + pw] = 16
    bar_w = max(pw // 7, 2)
    base = (_BLUE if label_is_blue(label) else _RED).astype(np.int32)
    color = np.clip(base + rng.integers(-40, 40, size=3), 0, 255).astype(
        np.uint8
    )  # LED brightness/tint jitter
    img[py : py + ph, px : px + bar_w] = color
    img[py : py + ph, px + pw - bar_w : px + pw] = color
    # glyph in the middle ~60%
    gx = px + int(pw * 0.22)
    gw = int(pw * 0.56)
    gy = py + int(ph * 0.12)
    gh = int(ph * 0.76)
    _draw_glyph(img, gx, gy, gw, gh, _LABEL_GLYPH[label])
    return (px, py, pw, ph)


def _add_distractors(img: np.ndarray, rng: np.random.Generator) -> None:
    """Non-armor colored clutter so color alone is not sufficient."""
    h, w = img.shape[:2]
    for _ in range(rng.integers(0, 4)):
        dw = int(rng.integers(8, 40))
        dh = int(rng.integers(8, 40))
        x = int(rng.integers(0, max(w - dw, 1)))
        y = int(rng.integers(0, max(h - dh, 1)))
        color = rng.integers(0, 255, size=3)
        img[y : y + dh, x : x + dw] = color


def _overlap_frac(a, b) -> float:
    """Intersection area over the smaller box's area."""
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    iw = max(min(ax + aw, bx + bw) - max(ax, bx), 0)
    ih = max(min(ay + ah, by + bh) - max(ay, by), 0)
    return iw * ih / max(min(aw * ah, bw * bh), 1)


def _draw_distractor_car(rng, img, width, height, car_size) -> None:
    """A car body WITHOUT an armor plate: tempts the car detector (negative
    for precision) and the armor stage (a crop with no plate)."""
    cw = int(rng.integers(car_size[0], car_size[1]))
    ch = int(cw * rng.uniform(0.6, 0.95))
    if cw >= width - 2 or ch >= height - 2:
        return
    x = int(rng.integers(1, width - cw - 1))
    y = int(rng.integers(1, height - ch - 1))
    body = int(rng.integers(30, 75))
    img[y : y + ch, x : x + cw] = body
    wh = max(ch // 6, 2)
    img[y + ch - wh : y + ch, x : x + cw] = max(body - 20, 8)
    img[y : y + max(ch // 10, 1), x : x + cw] = min(body + 25, 255)


def _motion_blur(img, box, k: int) -> None:
    """Horizontal box blur of width k over the box region (in place)."""
    x, y, w, h = (int(v) for v in box)
    x0, y0 = max(x - k, 0), max(y, 0)
    x1, y1 = min(x + w + k, img.shape[1]), min(y + h, img.shape[0])
    if x1 - x0 < 2 * k + 2 or y1 <= y0:
        return
    region = img[y0:y1, x0:x1].astype(np.float32)
    c = np.cumsum(
        np.pad(region, ((0, 0), (1, 0), (0, 0))), axis=1
    )
    out = (c[:, k:] - c[:, :-k]) / k
    img[y0:y1, x0 : x0 + out.shape[1]] = np.clip(out, 0, 255).astype(
        np.uint8
    )


def _apply_lighting(img, rng) -> None:
    """Global exposure extreme + a few local shadow/glare patches."""
    gain = rng.uniform(0.45, 1.7)
    offs = rng.uniform(-25, 25)
    out = img.astype(np.float32) * gain + offs
    h, w = img.shape[:2]
    for _ in range(rng.integers(1, 4)):
        pw = int(rng.integers(w // 8, w // 2))
        ph = int(rng.integers(h // 8, h // 2))
        px = int(rng.integers(0, w - pw))
        py = int(rng.integers(0, h - ph))
        out[py : py + ph, px : px + pw] *= rng.uniform(0.5, 1.5)
    img[:] = np.clip(out, 0, 255).astype(np.uint8)


# ------------------------------------------------------- arena domain (r4)
#
# Domain randomization toward the REAL match frames bundled with the
# reference (assets/images/0..9.jpg: a dark textured arena, robots that are
# dark bodies with glowing team-colored light bars and bloom, heavy color
# cast and JPEG artifacts). The procedural "flat" domain above trains
# detectors that transfer NOT AT ALL to those frames (round-4 baseline:
# 0/70 recall — tools/eval_real.py); the ``arena=True`` scene style closes
# the gap procedurally: no real frame is ever trained on (the 10 bundled
# frames are the held-out eval set, assets/labels/real_frames.json).


def _boxblur(img: np.ndarray, k: int) -> np.ndarray:
    """Separable box blur (float32 HWC) via cumsum — no cv2 in this image."""
    if k <= 1:
        return img
    out = img.astype(np.float32)
    for axis in (0, 1):
        pad_l, pad_r = k // 2, k - 1 - k // 2
        width = [(0, 0)] * out.ndim
        width[axis] = (pad_l, pad_r)
        p = np.pad(out, width, mode="edge")
        c = np.cumsum(p, axis=axis, dtype=np.float32)
        zero = np.zeros_like(np.take(c, [0], axis=axis))
        c = np.concatenate([zero, c], axis=axis)
        n = out.shape[axis]
        idx = np.arange(n)
        out = (
            np.take(c, idx + k, axis=axis) - np.take(c, idx, axis=axis)
        ) / k
    return out


def _rot_rect_mask(y, x, cx, cy, a, b, theta):
    """Boolean mask of a rotated rectangle (half-extents a, b)."""
    dx, dy = x - cx, y - cy
    ct, st = np.cos(theta), np.sin(theta)
    return (np.abs(dx * ct + dy * st) < a) & (np.abs(-dx * st + dy * ct) < b)


def _led_strip(dr, rng, a, b, col, t: int) -> None:
    """Segmented bright LED strip from a to b (gaps every few tens of px,
    like the real arena's edge lighting)."""
    length = float(np.hypot(b[0] - a[0], b[1] - a[1]))
    n = max(int(length / rng.uniform(60, 160)), 1)
    for i in range(n):
        f0 = i / n
        f1 = f0 + rng.uniform(0.55, 0.97) / n
        p0 = (a[0] + (b[0] - a[0]) * f0, a[1] + (b[1] - a[1]) * f0)
        p1 = (a[0] + (b[0] - a[0]) * f1, a[1] + (b[1] - a[1]) * f1)
        dr.line([p0, p1], fill=col, width=t)


def _draw_arena_structures(
    img: np.ndarray, rng: np.random.Generator, h: int, w: int
) -> np.ndarray:
    """3D terrain structures + stadium lighting as NEGATIVES (v4).

    The v3 arena retrain fired at 0.95+ confidence on exactly four kinds of
    real structure (tools/eval_real.py FP crops, round 4): raised terrain
    blocks whose edges carry bright red/blue LED strips, overexposed white
    ball lamps on dark posts, thick bright blue painted floor lines, and
    red zigzag LED polylines — none of which the v3 background contained at
    that scale or intensity. Each is drawn here, via PIL (C-speed polygon
    and wide-line fills on the camera-res canvas). Colors are BGR tuples:
    the array is BGR, PIL just doesn't know it.
    """
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    dr = ImageDraw.Draw(im)
    red, blue = (30, 40, 235), (235, 110, 50)
    base = float(img.mean())
    # Raised terrain platforms: light top facet, dark side facet, LED strip
    # along the front edge (the dominant real FP at 150-600 px scale).
    for _ in range(int(rng.integers(3, 9))):
        cx = rng.uniform(0, w)
        cy = rng.uniform(h * 0.2, h * 0.95)
        pw = rng.uniform(0.08, 0.45) * w
        ph = rng.uniform(0.03, 0.16) * h
        skew = rng.uniform(-0.3, 0.3) * pw
        p0 = (cx - pw / 2 + skew, cy - ph / 2)
        p1 = (cx + pw / 2 + skew, cy - ph / 2)
        p2 = (cx + pw / 2, cy + ph / 2)
        p3 = (cx - pw / 2, cy + ph / 2)
        lvl = base * rng.uniform(1.05, 1.8) + rng.uniform(0, 20)
        top_col = tuple(
            int(np.clip(lvl * f, 0, 255)) for f in (1.3, 0.95, 1.05)
        )
        dr.polygon([p0, p1, p2, p3], fill=top_col)
        sh = rng.uniform(0.02, 0.09) * h
        s_lvl = base * rng.uniform(0.3, 0.7)
        side_col = tuple(
            int(np.clip(s_lvl * f, 0, 255)) for f in (1.2, 0.9, 1.0)
        )
        dr.polygon(
            [p3, p2, (p2[0], p2[1] + sh), (p3[0], p3[1] + sh)],
            fill=side_col,
        )
        col = red if rng.random() < 0.6 else blue
        t = int(rng.integers(3, 9))
        if rng.random() < 0.9:  # front-edge strip
            _led_strip(dr, rng, p3, p2, col, t)
        if rng.random() < 0.5:  # far-edge strip
            _led_strip(dr, rng, p0, p1, col, t)
        if rng.random() < 0.35 and sh > 8:  # dark opening in the side
            # facet with a red rim
            ow = max(rng.uniform(0.1, 0.3) * pw, 4.0)
            ox = rng.uniform(p3[0] + 4, max(p2[0] - ow - 4, p3[0] + 5))
            oy = p3[1] + 2
            dr.rectangle(
                [ox, oy, ox + ow, oy + sh - 2], fill=(8, 8, 12),
                outline=red, width=max(t // 2, 2),
            )
    # Totem pillars: dark post with paired bright vertical strips and a
    # glowing orb (the real frames' lit pillars / exchange stations).
    for _ in range(int(rng.integers(0, 4))):
        tx = rng.uniform(0, max(w - 60, 1))
        ty = rng.uniform(0, h * 0.8)
        tw_ = rng.uniform(18, min(80, max(w / 6, 20)))
        th_ = rng.uniform(2.0, 4.5) * tw_
        dr.rectangle([tx, ty, tx + tw_, ty + th_], fill=(14, 12, 16))
        col = red if rng.random() < 0.7 else blue
        for fx in (0.2, 0.75):
            sx = tx + fx * tw_
            dr.line(
                [(sx, ty + 0.15 * th_), (sx, ty + th_)],
                fill=col, width=max(int(tw_ * 0.12), 2),
            )
        if rng.random() < 0.6:  # glowing orb near the top
            r = tw_ * rng.uniform(0.2, 0.4)
            ox, oy = tx + tw_ / 2, ty + 0.1 * th_
            oc = (
                (80, 235, 120) if rng.random() < 0.4
                else (250, 250, 250)
            )
            dr.ellipse([ox - r, oy - r, ox + r, oy + r], fill=oc)
    # Overexposed white ball lamps on dark posts (stage lighting).
    for _ in range(int(rng.integers(1, 5))):
        r = rng.uniform(8, min(40, max(w / 6, 10)))
        lx = rng.uniform(r, max(w - r, r + 1))
        ly = rng.uniform(r, h * 0.7)
        dr.rectangle(
            [lx - r * 0.15, ly, lx + r * 0.15, ly + r * rng.uniform(2, 5)],
            fill=(10, 10, 10),
        )
        dr.ellipse(
            [lx - r, ly - r, lx + r, ly + r], fill=(255, 255, 255)
        )
    # Thick bright blue painted floor lines, often parallel pairs.
    for _ in range(int(rng.integers(1, 5))):
        theta = rng.uniform(0, np.pi)
        cx = rng.uniform(0, w)
        cy = rng.uniform(h * 0.3, h)
        dx, dy = np.cos(theta), np.sin(theta)
        ext = w + h
        t = int(rng.integers(5, 16))
        a = (cx - dx * ext, cy - dy * ext)
        b = (cx + dx * ext, cy + dy * ext)
        dr.line([a, b], fill=blue, width=t)
        if rng.random() < 0.6:  # parallel twin
            off = t * rng.uniform(1.5, 4.0)
            dr.line(
                [(a[0] - dy * off, a[1] + dx * off),
                 (b[0] - dy * off, b[1] + dx * off)],
                fill=blue, width=t,
            )
    # Red zigzag LED polylines (right-angle corner runs on dark walls).
    for _ in range(int(rng.integers(0, 3))):
        px = rng.uniform(0, w)
        py = rng.uniform(0, h)
        t = int(rng.integers(3, 8))
        pts = [(px, py)]
        horiz = rng.random() < 0.5
        for _seg in range(int(rng.integers(2, 6))):
            step = rng.uniform(40, 260) * (1 if rng.random() < 0.7 else -1)
            px, py = (px + step, py) if horiz else (px, py + step)
            horiz = not horiz
            pts.append((px, py))
        dr.line(pts, fill=red, width=t, joint="curve")
    return np.asarray(im, np.uint8).astype(np.float32)


def _background_arena(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Dark textured arena floor: multi-scale tonal noise, facet patches
    (ramps/walls), 3D terrain structures with LED-strip edges + stadium
    lighting (v4, see _draw_arena_structures), thin blue/white lane lines,
    LED dots, glow strips, and — critically — bright painted floor
    markings (text glyphs, zone brackets, arrows) as explicit NEGATIVES:
    the round-4 first arena retrain detected the real frames' "B0" floor
    text and arrow markings instead of robots (a model trained where the
    only bright glyphs sit on cars learns glyph-on-dark, not robot), so
    the background must contain the same distractors. The real floor also
    reads ~60-130 luminance with a blue/purple cast, not near-black."""
    base_lvl = rng.uniform(35, 100)
    img = np.full((h, w, 3), base_lvl, np.float32)
    # blue/purple floor cast (BGR): blue channel lifted, green suppressed
    img[..., 0] *= rng.uniform(1.1, 1.5)
    img[..., 1] *= rng.uniform(0.7, 1.0)
    img[..., 2] *= rng.uniform(0.8, 1.25)
    for cell, amp in ((256, 14), (64, 9), (16, 5)):
        # blur the coarse grid BEFORE kron (same smoothing, 1/cell^2 cost)
        g = rng.normal(0, amp, size=(-(-h // cell) + 2, -(-w // cell) + 2))
        g = _boxblur(g[..., None], 2)[..., 0]
        img += np.kron(g, np.ones((cell, cell)))[:h, :w, None]
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(rng.integers(4, 10)):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        a = rng.uniform(w * 0.05, w * 0.3)
        b = rng.uniform(h * 0.03, h * 0.25)
        m = _rot_rect_mask(y, x, cx, cy, a, b, rng.uniform(0, np.pi))
        img[m] += rng.uniform(-18, 30)
    img = _draw_arena_structures(img, rng, h, w)
    for _ in range(rng.integers(3, 9)):
        theta = rng.uniform(0, np.pi)
        c = rng.uniform(-0.3, 1.3) * (
            w * abs(np.cos(theta)) + h * abs(np.sin(theta))
        )
        d = np.abs(x * np.cos(theta) + y * np.sin(theta) - c)
        m = d < rng.uniform(1.5, 4.0)
        col = (
            np.array([rng.uniform(160, 255), rng.uniform(60, 140),
                      rng.uniform(30, 90)], np.float32)
            if rng.random() < 0.7
            else np.full(3, rng.uniform(140, 220), np.float32)
        )
        img[m] = img[m] * 0.3 + col * 0.7
    n_dots = int(rng.integers(40, 220))
    ys = rng.integers(0, h, n_dots)
    xs = rng.integers(0, w, n_dots)
    for yy, xx in zip(ys, xs):
        r = int(rng.integers(1, 3))
        img[max(yy - r, 0) : yy + r, max(xx - r, 0) : xx + r] = rng.uniform(
            150, 255
        )
    for _ in range(rng.integers(2, 7)):
        sw = int(rng.integers(20, 160))
        sh = int(rng.integers(3, 10))
        if rng.random() < 0.5:
            sw, sh = sh, sw
        sx = int(rng.integers(0, max(w - sw, 1)))
        sy = int(rng.integers(0, max(h - sh, 1)))
        col = (
            np.array([30, 40, 230], np.float32)
            if rng.random() < 0.5
            else np.array([230, 90, 40], np.float32)
        ) * rng.uniform(0.7, 1.1)
        img[sy : sy + sh, sx : sx + sw] = col
    # Painted floor markings — bright text glyphs with corner brackets
    # ("B0"-style zone labels), arrows, short glyph runs. These mimic the
    # real arena's floor text so glyph-on-dark is trained as background.
    for _ in range(rng.integers(2, 7)):
        gh_ = int(rng.integers(18, 90))
        gw_ = int(gh_ * rng.uniform(0.55, 0.8))
        n_glyphs = int(rng.integers(1, 4))
        x0 = int(rng.integers(0, max(w - (gw_ + 6) * n_glyphs - 30, 1)))
        y0 = int(rng.integers(0, max(h - gh_ - 20, 1)))
        shade = rng.uniform(150, 255)
        mark = np.zeros((h, w), bool)
        for g in range(n_glyphs):
            gx = x0 + g * (gw_ + 6)
            sub = np.zeros_like(mark)
            _draw_glyph_mask(sub, gx, y0, gw_, gh_,
                             str(rng.choice(list("12345S"))))
            mark |= sub
        if rng.random() < 0.6:  # corner brackets around the text
            bx0, by0 = x0 - 12, y0 - 10
            bx1 = x0 + n_glyphs * (gw_ + 6) + 6
            by1 = y0 + gh_ + 10
            t = max(gh_ // 12, 2)
            ln = max(gh_ // 3, 6)
            for cx, cy, dx, dy in ((bx0, by0, 1, 1), (bx1 - ln, by0, 1, 1),
                                   (bx0, by1 - ln, 1, 1),
                                   (bx1 - ln, by1 - ln, 1, 1)):
                ys0, xs0 = max(cy, 0), max(cx, 0)
                mark[ys0 : max(cy + t, 0), xs0 : max(cx + ln, 0)] = True
                mark[ys0 : max(cy + ln, 0), xs0 : max(cx + t, 0)] = True
        alpha = rng.uniform(0.55, 1.0)
        img[mark] = img[mark] * (1 - alpha) + shade * alpha
    for _ in range(rng.integers(0, 4)):  # white arrow / chevron markings
        ax = int(rng.integers(20, max(w - 80, 21)))
        ay = int(rng.integers(20, max(h - 80, 21)))
        s = int(rng.integers(14, 60))
        t = max(s // 5, 2)
        shade = rng.uniform(170, 255)
        for k in range(s):
            yy = ay + k
            if yy >= h:
                break
            half = max(s - k, 1) * t // s + 1
            xs0 = np.clip(ax + k - half, 0, w)
            xs1 = np.clip(ax + k + half, 0, w)
            img[yy, xs0:xs1] = shade
            xs0 = np.clip(ax - k - half, 0, w)
            xs1 = np.clip(ax - k + half, 0, w)
            img[yy, xs0:xs1] = shade
    for _ in range(rng.integers(1, 6)):  # round ceiling/stadium lamps
        cx = int(rng.integers(0, w))
        cy = int(rng.integers(0, h))
        r = int(rng.integers(4, 16))
        yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
        disc = (yy * yy + xx * xx) <= r * r
        ys0, ys1 = max(cy - r, 0), min(cy + r + 1, h)
        xs0, xs1 = max(cx - r, 0), min(cx + r + 1, w)
        img[ys0:ys1, xs0:xs1][
            disc[ys0 - (cy - r) : ys1 - (cy - r),
                 xs0 - (cx - r) : xs1 - (cx - r)]
        ] = rng.uniform(220, 255)
    if rng.random() < 0.8:
        # Out-of-arena dark band with LIT STRUCTURES as negatives: the
        # round-4 v2 retrain stopped detecting floor text but instead
        # detected lit doorways, LED signage and spotlights in the dark
        # region above the field — bright structure on near-black must be
        # trained as background too.
        band = int(rng.uniform(0.08, 0.3) * h)
        img[:band] = img[:band] * 0.25 + rng.normal(
            10, 4, size=img[:band].shape
        )
        for _ in range(rng.integers(2, 8)):
            kind = rng.random()
            sx = int(rng.integers(0, max(w - 160, 1)))
            sy = int(rng.integers(0, max(band - 40, 1)))
            if kind < 0.35:  # lit doorway / banner: tall warm rectangle
                dw_ = int(rng.integers(25, 120))
                dh_ = int(rng.integers(40, max(band - sy, 41)))
                col = np.array(
                    [rng.uniform(40, 120), rng.uniform(120, 210),
                     rng.uniform(190, 255)], np.float32)  # warm white BGR
                if rng.random() < 0.4:
                    col = col[::-1].copy()  # cool variant
                img[sy : sy + dh_, sx : sx + dw_] = (
                    col * rng.uniform(0.6, 1.0)
                )
            elif kind < 0.65:  # red/blue LED sign panel with dark gaps
                dw_ = int(rng.integers(60, 260))
                dh_ = int(rng.integers(15, 70))
                col = (
                    np.array([30, 40, 230], np.float32)
                    if rng.random() < 0.6
                    else np.array([230, 90, 40], np.float32)
                )
                panel = np.tile(col, (dh_, dw_, 1)) * rng.uniform(0.5, 1.0)
                gap = rng.integers(4, 16)
                panel[:, :: int(gap)] *= 0.15
                img[sy : sy + dh_, sx : sx + dw_] = panel[
                    : max(min(sy + dh_, h) - sy, 0),
                    : max(min(sx + dw_, w) - sx, 0),
                ]
            elif kind < 0.85:  # spotlight blob
                r = int(rng.integers(6, 22))
                yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
                disc = (yy * yy + xx * xx) <= r * r
                ys1 = min(sy + 2 * r + 1, h)
                xs1 = min(sx + 2 * r + 1, w)
                img[sy:ys1, sx:xs1][disc[: ys1 - sy, : xs1 - sx]] = (
                    rng.uniform(200, 255)
                )
            else:  # green exit/status lamps: small bright green runs
                for g in range(int(rng.integers(2, 6))):
                    gx2 = min(sx + g * int(rng.integers(8, 30)), w - 4)
                    img[sy : sy + 4, gx2 : gx2 + 4] = np.array(
                        [60, 230, 80], np.float32
                    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _draw_car_arena(
    img: np.ndarray, rng: np.random.Generator, box, label: int
):
    """Glow-style robot: dark body, glowing team light bars, lit wheels,
    bright (sometimes overexposed) number panel. Returns the plate xywh."""
    x, y, w, h = box
    team = (_BLUE if label_is_blue(label) else _RED).astype(np.float32)
    body = rng.uniform(8, 42)
    top = y + (int(h * rng.uniform(0.0, 0.3)) if rng.random() < 0.6 else 0)
    img[top : y + h, x : x + w] = np.clip(
        body + rng.normal(0, 5, size=(y + h - top, w, 1)), 0, 255
    ).astype(np.uint8)
    if top > y:
        tw = int(w * rng.uniform(0.3, 0.6))
        tx = x + int((w - tw) * rng.uniform(0.2, 0.8))
        img[y : top + 2, tx : tx + tw] = int(body * rng.uniform(0.7, 1.3))
    if rng.random() < 0.75:  # glowing cyan/green HEALTH BAR above the
        # body — every live robot in the real frames carries one
        bw_ = int(w * rng.uniform(0.25, 0.55))
        bh_ = max(int(h * rng.uniform(0.03, 0.08)), 2)
        bx_ = x + int((w - bw_) * rng.uniform(0.25, 0.75))
        by_ = max(y - (bh_ if rng.random() < 0.4 else 0), 0)
        hb = np.array(
            [rng.uniform(120, 220), rng.uniform(210, 255),
             rng.uniform(60, 160)], np.float32)  # BGR cyan-green
        img[by_ : by_ + bh_, bx_ : bx_ + bw_] = hb.astype(np.uint8)
    # Wheel row: 3-4 glowing rings along the base — the real robots' most
    # salient low-resolution feature (a horizontal run of team-colored
    # glow discs), not two dim hub patches.
    wh = max(h // 5, 2)
    img[y + h - wh : y + h, x : x + w] = max(int(body) - 6, 2)
    n_wheels = int(rng.integers(3, 5))
    for hub in range(n_wheels):
        hx = x + int((0.08 + 0.84 * hub / max(n_wheels - 1, 1)) * w)
        hw_ = max(int(w * rng.uniform(0.08, 0.14)), 2)
        glow_w = np.clip(
            team.astype(np.float32) * rng.uniform(1.0, 1.6)
            + rng.uniform(20, 80),
            0, 255)
        img[y + h - wh : y + h, hx : hx + hw_] = glow_w.astype(np.uint8)
    # Extra glow patches: FEW and COMPACT (v4). Long bright bars were the
    # v3 cars' dominant feature — and exactly what the arena's LED-strip
    # structure edges look like, which is why the v3 model fired at 0.95+
    # confidence on terrain edges (eval_real FP crops). The discriminative
    # robot signature is a compact CLUSTER of small glows, not a strip.
    for _ in range(rng.integers(0, 3)):
        horizontal = rng.random() < 0.6
        if horizontal:
            bw = int(w * rng.uniform(0.12, 0.45))
            bh = max(int(h * rng.uniform(0.04, 0.1)), 2)
        else:
            bw = max(int(w * rng.uniform(0.04, 0.1)), 2)
            bh = int(h * rng.uniform(0.15, 0.4))
        bx = x + int(max(w - bw, 1) * rng.random())
        by = top + int(max(y + h - top - bh, 1) * rng.random())
        glow = np.clip(
            team * rng.uniform(0.8, 1.3) + rng.uniform(0, 90), 0, 255
        )
        img[by : by + bh, bx : bx + bw] = glow.astype(np.uint8)
    # Grey structural machinery above the wheelbase — the real robots read
    # as visible mid-grey mechanics, not featureless black boxes; without
    # this the only bright thing on a car is its glyph, and the model
    # degenerates to a glyph detector (round-4 lesson: it then detects the
    # arena's painted floor text instead of robots).
    for _ in range(rng.integers(1, 4)):
        sw_ = max(int(w * rng.uniform(0.12, 0.45)), 2)
        sh_ = max(int(h * rng.uniform(0.08, 0.3)), 2)
        sx_ = x + int(max(w - sw_, 1) * rng.random())
        sy_ = top + int(max(y + h - wh - top - sh_, 1) * rng.random())
        img[sy_ : sy_ + sh_, sx_ : sx_ + sw_] = int(
            min(body * rng.uniform(1.5, 3.5) + rng.uniform(10, 40), 160)
        )
    # Number plate: REAL plates at radar distance are small and often dim
    # — keep the glyph legible but not the car's dominant feature.
    pw = int(w * rng.uniform(0.2, 0.4))
    ph = int(h * rng.uniform(0.18, 0.32))
    pw, ph = max(pw, 8), max(ph, 8)
    px = x + int((w - pw) * rng.uniform(0.2, 0.8))
    py = y + int((h - ph) * rng.uniform(0.45, 0.85))
    img[py : py + ph, px : px + pw] = int(rng.uniform(5, 20))
    bar_w = max(pw // 7, 1)
    bar = np.clip(team * rng.uniform(0.9, 1.3) + 30, 0, 255).astype(np.uint8)
    img[py : py + ph, px : px + bar_w] = bar
    img[py : py + ph, px + pw - bar_w : px + pw] = bar
    gx = px + int(pw * 0.22)
    gw = int(pw * 0.56)
    gy = py + int(ph * 0.12)
    gh = int(ph * 0.76)
    # LED digit: glows in team color (toward white-hot at the core range)
    digit = np.clip(
        team.astype(np.float32) * rng.uniform(1.0, 1.5)
        + rng.uniform(40, 140),
        0, 255,
    ).astype(np.uint8)
    _draw_glyph(img, gx, gy, gw, gh, _LABEL_GLYPH[label], color=digit)
    if rng.random() < 0.5:  # dim plate lighting: scale the glyph down
        # toward the panel level (distance/exposure variation)
        plate = img[py : py + ph, px : px + pw].astype(np.float32)
        img[py : py + ph, px : px + pw] = (
            plate * rng.uniform(0.45, 0.85)
        ).astype(np.uint8)
    if rng.random() < 0.2:  # overexposed panel: glyph washes out (real
        # frames show this on bright plates — irreducibly hard labels)
        img[py : py + ph, px : px + pw] = np.clip(
            img[py : py + ph, px : px + pw].astype(np.float32)
            + rng.uniform(120, 200),
            0,
            255,
        ).astype(np.uint8)
    return (px, py, pw, ph)


def apply_photometrics(
    img: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Camera/sensor model: color cast, gamma, bloom around lights, noise,
    defocus, JPEG artifacts. Returns a new uint8 image."""
    out = img.astype(np.float32)
    gains = np.array(
        [rng.uniform(0.9, 1.35), rng.uniform(0.75, 1.1),
         rng.uniform(0.75, 1.2)],
        np.float32,
    )
    out *= gains  # color cast (BGR; the real frames lean blue/purple)
    # gamma via a 1024-entry LUT (np.power over 16M pixels is the hot spot)
    lut = 255.0 * np.power(
        np.linspace(0.0, 1.0, 1024, dtype=np.float32),
        np.float32(rng.uniform(0.65, 1.6)),
    )
    out = lut[np.clip(out * (1023.0 / 255.0), 0, 1023).astype(np.int32)]
    bright = np.clip(out - rng.uniform(150, 200), 0, None)
    if bright.max() > 0:  # bloom (computed at 1/4 scale: a glow is smooth)
        small = bright[::4, ::4]
        k = (int(rng.integers(5, 15)) // 4 + 1) | 1
        glow = _boxblur(_boxblur(small, k), k) * rng.uniform(0.5, 1.2)
        out += np.kron(glow, np.ones((4, 4, 1), np.float32))[
            : out.shape[0], : out.shape[1]
        ]
    if rng.random() < 0.35:  # defocus
        out = _boxblur(out, int(rng.integers(2, 4)))
    out += rng.standard_normal(out.shape, dtype=np.float32) * np.float32(
        rng.uniform(2, 9)
    )
    out = np.clip(out, 0, 255).astype(np.uint8)
    if rng.random() < 0.8:  # JPEG round trip
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(out[..., ::-1]).save(
            buf, "JPEG", quality=int(rng.integers(40, 90))
        )
        buf.seek(0)
        out = np.asarray(Image.open(buf))[..., ::-1].copy()
    return out


def make_scene(
    rng: np.random.Generator,
    height: int = 640,
    width: int = 640,
    max_cars: int = 6,
    car_size: Tuple[int, int] = (40, 170),
    n_cars: Optional[int] = None,
    hard: bool = False,
    arena: bool = False,
) -> Scene:
    """One full-field scene with ``n_cars`` (default random 0..max_cars).

    ``hard=True`` adds the difficulty the easy distribution lacks (the
    saturated-eval fix): partial car-car occlusion (later-drawn cars overlap
    earlier ones up to 45% and may cover their plates — per-armor visibility
    is reported in ``armor_visible``), frame-edge truncation, motion blur,
    global/local lighting extremes, and armor-less distractor cars that
    tempt both cascade stages.

    Beyond the random-overlap occlusion, ~35% of later-placed hard cars are
    deliberately AIMED at an earlier car's armor plate, covering a random
    0.3-0.85 horizontal fraction of it. This is the tier's durable
    discriminative axis: the armor stage trains on single-car canvases
    (tools/train_synth.py), so car-car plate occlusion can never enter its
    training distribution — a mostly-covered glyph is irreducibly ambiguous
    and keeps hard-tier label accuracy strictly inside (0, 1) even after
    hard-mix retrains saturate the blur/lighting/truncation axes (the
    round-3 event that forced this hardening; see PERF.md).

    ``arena=True`` switches to the real-domain randomized style (dark
    textured arena background, glow-rendered robots, photometric camera
    model — see the "arena domain" section above); combinable with
    ``hard``.
    """
    img = (_background_arena if arena else _background)(rng, height, width)
    _add_distractors(img, rng)
    if hard:
        for _ in range(rng.integers(1, 3)):
            _draw_distractor_car(rng, img, width, height, car_size)
    if n_cars is None:
        n_cars = int(rng.integers(0, max_cars + 1))
    # Labels are unique within a scene: a RoboMaster match fields one robot
    # per class, and the cascade's same-label dedup (detector.cpp:431-450)
    # keeps a single robot per label by design.
    scene_labels = rng.permutation(12)[: max(n_cars, 0)]
    cars, armors, labels, owners = [], [], [], []
    occupied: list = []
    max_overlap = 0.45 if hard else 0.0
    for i in range(n_cars):
        for attempt in range(30):  # rejection-sample a placement
            cw = int(rng.integers(car_size[0], car_size[1]))
            ch = int(cw * rng.uniform(0.6, 0.95))
            if cw >= width - 2 or ch >= height - 2:
                continue
            cap = max_overlap
            if hard and armors and attempt < 15 and rng.random() < 0.35:
                # Aimed plate occlusion: cover a horizontal fraction f of a
                # previous car's plate (full plate height), leaving the rest
                # of the glyph visible — the armor stage's eval-only axis.
                # Covering the plate band can cost more car-box overlap than
                # the random cap allows, so aimed attempts get a looser one.
                cap = 0.65
                px, py, pw, ph = armors[int(rng.integers(len(armors)))]
                f = rng.uniform(0.3, 0.85)
                if rng.random() < 0.5:  # cover the plate's left portion
                    x = int(px + f * pw - cw)
                else:  # cover the plate's right portion
                    x = int(px + (1.0 - f) * pw)
                ylo = int(py + ph - ch)
                x = int(np.clip(x, -cw // 2, width - cw // 2 - 1))
                y = int(np.clip(int(rng.integers(ylo, py + 1))
                                if ylo <= py else ylo,
                                -ch // 2, height - ch // 2 - 1))
            elif hard and rng.random() < 0.25:
                # Edge truncation: center can sit outside the frame; keep
                # at least ~35% of the car visible.
                x = int(rng.integers(-cw // 2, width - cw // 2))
                y = int(rng.integers(-ch // 2, height - ch // 2))
            else:
                x = int(rng.integers(1, width - cw - 1))
                y = int(rng.integers(1, height - ch - 1))
            vis_x0, vis_y0 = max(x, 0), max(y, 0)
            vis_x1 = min(x + cw, width)
            vis_y1 = min(y + ch, height)
            if (vis_x1 - vis_x0) * (vis_y1 - vis_y0) < 0.35 * cw * ch:
                continue
            ok = all(
                _overlap_frac((x, y, cw, ch), o) <= cap for o in occupied
            )
            if ok:
                break
        else:
            continue
        label = int(scene_labels[i])
        if x < 0 or y < 0 or x + cw > width or y + ch > height:
            # Truncated car: render on its own canvas, paste the visible
            # part (negative numpy slices would wrap around).
            patch = np.zeros((ch, cw, 3), np.uint8)
            draw = _draw_car_arena if arena else _draw_car
            pa = draw(patch, rng, (0, 0, cw, ch), label)
            img[vis_y0:vis_y1, vis_x0:vis_x1] = patch[
                vis_y0 - y : vis_y1 - y, vis_x0 - x : vis_x1 - x
            ]
            armor = (pa[0] + x, pa[1] + y, pa[2], pa[3])
        else:
            draw = _draw_car_arena if arena else _draw_car
            armor = draw(img, rng, (x, y, cw, ch), label)
        if hard and rng.random() < 0.3:
            _motion_blur(
                img, (vis_x0, vis_y0, vis_x1 - vis_x0, vis_y1 - vis_y0),
                int(rng.integers(4, 12)),
            )
        occupied.append((x, y, cw, ch))
        # Ground truth is the VISIBLE (clipped) car box.
        cars.append(
            (vis_x0, vis_y0, vis_x1 - vis_x0, vis_y1 - vis_y0)
        )
        armors.append(armor)
        labels.append(label)
        owners.append(len(cars) - 1)
    # Per-armor visibility: share of the plate not overdrawn by LATER cars.
    visible = np.ones(len(armors), np.float32)
    for j, (ax, ay, aw, ah) in enumerate(armors):
        for lx, ly, lw, lh in occupied[j + 1 :]:
            iw = max(min(ax + aw, lx + lw) - max(ax, lx), 0)
            ih = max(min(ay + ah, ly + lh) - max(ay, ly), 0)
            visible[j] *= 1.0 - iw * ih / max(aw * ah, 1)
    if hard:
        _apply_lighting(img, rng)
    if arena:
        img = apply_photometrics(img, rng)
    return Scene(
        image=img,
        car_xywh=np.asarray(cars, np.float32).reshape(-1, 4),
        armor_xywh=np.asarray(armors, np.float32).reshape(-1, 4),
        armor_label=np.asarray(labels, np.int32).reshape(-1),
        armor_car=np.asarray(owners, np.int32).reshape(-1),
        armor_visible=visible,
    )


def make_crop_scene(
    rng: np.random.Generator, size: int = 640, arena: bool = False
) -> Scene:
    """One armor-stage training sample: a single car filling most of the
    frame, as the cascade's crop+letterbox produces (detector.cpp:417-424).

    Mimics the two crop artifacts the armor model sees at inference: gray
    letterbox padding bars (value 128, detector.cu:102-133) and blocky
    upsampling (small cars are letterboxed 2-6x up; emulated by rendering at
    low resolution and nearest-upsampling).
    """
    up = int(rng.choice([1, 1, 2, 4]))
    s = size // up
    img = (_background_arena if arena else _background)(rng, s, s)
    frac = rng.uniform(0.45, 0.95)
    cw = int(s * frac)
    ch = int(cw * rng.uniform(0.65, 0.95))
    ch = min(ch, s - 2)
    x = int(rng.integers(0, s - cw)) if s > cw else 0
    y = int(rng.integers(0, s - ch)) if s > ch else 0
    label = int(rng.integers(0, 12))
    armor = (_draw_car_arena if arena else _draw_car)(
        img, rng, (x, y, cw, ch), label
    )
    if arena:
        img = apply_photometrics(img, rng)
    # letterbox pad bars (both sides, like a centered letterbox)
    if rng.random() < 0.5:
        pad = int(rng.integers(0, s // 4))
        if rng.random() < 0.5:
            img[:pad], img[s - pad :] = 128, 128
            keep = (armor[1] >= pad) and (armor[1] + armor[3] <= s - pad)
        else:
            img[:, :pad], img[:, s - pad :] = 128, 128
            keep = (armor[0] >= pad) and (armor[0] + armor[2] <= s - pad)
        if not keep:  # plate destroyed by the pad: relabel as background
            return make_crop_scene(rng, size, arena=arena)
    if up > 1:
        img = np.kron(img, np.ones((up, up, 1), np.uint8))
        armor = tuple(v * up for v in armor)
    return Scene(
        image=img,
        car_xywh=np.asarray([[0, 0, size, size]], np.float32),
        armor_xywh=np.asarray([armor], np.float32),
        armor_label=np.asarray([label], np.int32),
        armor_car=np.zeros((1,), np.int32),
    )


# ----------------------------------------------------------- LiDAR clouds
#
# Synthetic clouds *correlated with the scene geometry*, so locate/search/
# track run at realistic occupancy (the reference's sample app feeds images
# and clouds of the same physical scene, samples/main.cpp:74-99). The
# synthetic LiDAR has a fixed scan lattice (quasi-static scan directions,
# expressed as zoomed-image pixel centers): the background cloud covers the
# whole lattice, frame clouds sample it — so a frame's car-surface returns
# land on pixels whose background depth is known, which is exactly the
# condition Locator::update's diff needs (locate.cpp:200-219).

_SCAN_STRIDE = 9  # zoomed px between scan directions; full lattice of a
# 1296x1024 zoomed image = 144x113 = 16272 points <= the locator's 16384
# point capacity, so the background prime covers every lattice pixel.


def _terrain_depth_mm(u, v, zw: int, zh: int):
    """Deterministic smooth field depth (mm) per zoomed pixel: 12-22 m."""
    return 12000.0 + 4000.0 * (u / zw) + 6000.0 * (v / zh)


def _scan_lattice(zh: int, zw: int, stride: int = _SCAN_STRIDE):
    """Fixed scan directions as zoomed pixel centers (u, v) float64."""
    us = np.arange(stride // 2, zw, stride, dtype=np.float64) + 0.5
    vs = np.arange(stride // 2, zh, stride, dtype=np.float64) + 0.5
    uu, vv = np.meshgrid(us, vs)
    return uu.ravel(), vv.ravel()


def _backproject_zoomed(u, v, d, calibration, zoom_factor: float):
    """Exact inverse (f64) of geometry.lidar_to_camera_uvd: zoomed pixel +
    camera depth (mm) -> LiDAR-frame mm. (The *true* inverse — not the
    reference's quirky cameraToLidar — so generated points project back onto
    exactly the requested pixels.)"""
    K = np.asarray(calibration.intrinsic, np.float64)
    l2c = np.asarray(calibration.lidar_to_camera, np.float64)
    proj = np.stack([u * d / zoom_factor, v * d / zoom_factor, d], axis=-1)
    cam = proj @ np.linalg.inv(K).T
    pts = (cam - l2c[:3, 3]) @ np.linalg.inv(l2c[:3, :3]).T
    return pts.astype(np.float32)


def make_background_cloud(
    rng: np.random.Generator,
    height: int,
    width: int,
    calibration=None,
    zoom_factor: float = 0.5,
    depth_noise: float = 40.0,
    max_points: int = 16384,
) -> np.ndarray:
    """Empty-field background cloud over the full scan lattice (the
    analogue of the reference's background.pcd, samples/main.cpp:85).
    Subsampled to ``max_points`` when the lattice slightly exceeds the
    locator's cloud capacity (2592x2048 at stride 9: 16416 points)."""
    if calibration is None:
        from ..configs import Calibration

        calibration = Calibration()
    zw, zh = int(width * zoom_factor), int(height * zoom_factor)
    u, v = _scan_lattice(zh, zw)
    if u.size > max_points:
        sel = rng.choice(u.size, size=max_points, replace=False)
        u, v = u[sel], v[sel]
    d = _terrain_depth_mm(u, v, zw, zh) + rng.normal(0.0, depth_noise, u.shape)
    return _backproject_zoomed(u, v, d, calibration, zoom_factor)


def make_scene_cloud(
    rng: np.random.Generator,
    scene: Scene,
    calibration=None,
    zoom_factor: float = 0.5,
    n_terrain: int = 9000,
    car_points: int = 120,
    depth_drop: Tuple[float, float] = (1000.0, 2800.0),
    depth_noise: float = 40.0,
) -> np.ndarray:
    """One frame's cloud for ``scene``: terrain returns off the scan lattice
    (excluding car footprints — the cars occlude the floor) plus car-surface
    returns 1-2.8 m in front of the terrain at the car's pixels. The depth
    drop sits inside the locator's [min_depth_diff, max_depth_diff] window
    (500..4000 mm, locator.h:59-65), so car pixels whose background is known
    become foreground; lattice spacing (~160-340 mm at field depths) sits
    inside the 400 mm cluster tolerance, so each car forms one cluster."""
    if calibration is None:
        from ..configs import Calibration

        calibration = Calibration()
    h, w = scene.image.shape[:2]
    zw, zh = int(w * zoom_factor), int(h * zoom_factor)
    u, v = _scan_lattice(zh, zw)
    boxes = scene.car_xywh * zoom_factor
    inside_any = np.zeros(u.shape, bool)
    per_car_inside = []
    for x, y, bw, bh in boxes:
        inside = (u >= x) & (u < x + bw) & (v >= y) & (v < y + bh)
        per_car_inside.append(inside)
        inside_any |= inside
    terrain_idx = np.flatnonzero(~inside_any)
    take = min(n_terrain, terrain_idx.size)
    sel = rng.choice(terrain_idx, size=take, replace=False)
    tu, tv = u[sel], v[sel]
    td = _terrain_depth_mm(tu, tv, zw, zh) + rng.normal(
        0.0, depth_noise, tu.shape
    )
    parts = [_backproject_zoomed(tu, tv, td, calibration, zoom_factor)]
    for inside in per_car_inside:
        idx = np.flatnonzero(inside)
        if idx.size == 0:
            continue
        if idx.size > car_points:
            idx = rng.choice(idx, size=car_points, replace=False)
        cu, cv = u[idx], v[idx]
        drop = rng.uniform(*depth_drop)
        cd = (
            _terrain_depth_mm(cu, cv, zw, zh)
            - drop
            + rng.normal(0.0, 30.0, cu.shape)
        )
        parts.append(_backproject_zoomed(cu, cv, cd, calibration, zoom_factor))
    return np.concatenate(parts, axis=0)


def scene_to_targets(
    scenes, kind: str, capacity: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stack scenes into (images u8 [B,H,W,3], xywh [B,G,4], label [B,G],
    valid [B,G]) for DetectionTargets. ``kind``: 'car' (1 class, label 0) or
    'armor' (12 classes)."""
    images = np.stack([s.image for s in scenes])
    b = len(scenes)
    xywh = np.zeros((b, capacity, 4), np.float32)
    label = np.zeros((b, capacity), np.int32)
    valid = np.zeros((b, capacity), bool)
    for i, s in enumerate(scenes):
        boxes = s.car_xywh if kind == "car" else s.armor_xywh
        labs = (
            np.zeros(len(boxes), np.int32)
            if kind == "car"
            else s.armor_label
        )
        n = min(len(boxes), capacity)
        xywh[i, :n] = boxes[:n]
        label[i, :n] = labs[:n]
        valid[i, :n] = True
    return images, xywh, label, valid

"""Detection/track visualization (reference samples/sample_radar.h:135-281).

The reference draws car/armor boxes, label text, world location and track
state with OpenCV and blocks on imshow. Here drawing is PIL-based (no OpenCV
dependency) and returns/saves an annotated image instead of opening windows —
this is tooling, not a pipeline stage. Colors follow the reference: blue team
blue, red team red, unknown gray.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from ..types import Label, TrackState

_BLUE = (80, 127, 255)
_RED = (255, 99, 71)
_GRAY = (190, 190, 190)
_STATE_NAMES = {
    TrackState.TENTATIVE: "tentative",
    TrackState.CONFIRMED: "confirmed",
    TrackState.DELETED: "deleted",
}

LABEL_NAMES = {
    Label.BLUE_HERO: "B1",
    Label.BLUE_ENGINEER: "B2",
    Label.BLUE_INFANTRY_3: "B3",
    Label.BLUE_INFANTRY_4: "B4",
    Label.BLUE_INFANTRY_5: "B5",
    Label.RED_HERO: "R1",
    Label.RED_ENGINEER: "R2",
    Label.RED_INFANTRY_3: "R3",
    Label.RED_INFANTRY_4: "R4",
    Label.RED_INFANTRY_5: "R5",
    Label.BLUE_SENTRY: "Bs",
    Label.RED_SENTRY: "Rs",
}


def _team_color(label: Optional[int]):
    """Blue classes 0-4 and 10 are blue; 5-9 and 11 red; unknown gray
    (reference cvColor, sample_radar.h:129-160)."""
    if label is None or label < 0:
        return _GRAY
    if label in (0, 1, 2, 3, 4, 10):
        return _BLUE
    return _RED


def draw_robots(
    image_bgr: np.ndarray, robots: Iterable, save_path: Optional[str] = None
) -> np.ndarray:
    """Annotate a BGR uint8 image with robot detections/tracks.

    ``robots`` is the list returned by Radar.run_once. Returns the annotated
    RGB array; optionally saves a PNG.
    """
    from PIL import Image, ImageDraw

    rgb = np.ascontiguousarray(image_bgr[..., ::-1])
    img = Image.fromarray(rgb)
    draw = ImageDraw.Draw(img)

    for robot in robots:
        if robot.rect is None:
            continue
        x, y, w, h = [float(v) for v in robot.rect]
        color = _team_color(robot.label)
        draw.rectangle([x, y, x + w, y + h], outline=color, width=4)
        if robot.armors is not None:
            for armor in robot.armors:
                ax, ay, aw, ah = [float(v) for v in armor[:4]]
                draw.rectangle(
                    [ax, ay, ax + aw, ay + ah], outline=color, width=2
                )
        lines = []
        if robot.label is not None and robot.label >= 0:
            name = LABEL_NAMES.get(Label(int(robot.label)), str(robot.label))
            conf = f" {robot.confidence:.2f}" if robot.confidence else ""
            lines.append(f"{name}{conf}")
        if robot.location is not None:
            lx, ly, lz = [float(v) for v in robot.location]
            lines.append(f"({lx:.2f}, {ly:.2f}, {lz:.2f}) m")
        if robot.track_state is not None:
            lines.append(_STATE_NAMES.get(robot.track_state, "?"))
        for i, line in enumerate(lines):
            draw.text((x + 4, y + 4 + 16 * i), line, fill=color)

    out = np.asarray(img)
    if save_path:
        img.save(save_path)
    return out

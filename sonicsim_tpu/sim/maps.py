"""Top-down maps and trajectory trace rendering.

Replaces the habitat-lab maps utilities + matplotlib drawing used by the
reference (SonicSim_rir.py:825-1043: convert_points_to_topdown, display_map,
save_town_map_grid, draw_path, save_trace_gif) with a raster over NavGrid.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .geometry import NavGrid


def topdown_map(nav: NavGrid, meters_per_pixel: float = 0.05) -> np.ndarray:
    """Boolean navigability raster at the requested resolution (True=free)."""
    lo, hi = nav.get_bounds()
    nx = max(int((hi[0] - lo[0]) / meters_per_pixel), 1)
    nz = max(int((hi[2] - lo[2]) / meters_per_pixel), 1)
    xs = lo[0] + (np.arange(nx) + 0.5) * meters_per_pixel
    zs = lo[2] + (np.arange(nz) + 0.5) * meters_per_pixel
    out = np.zeros((nz, nx), bool)
    for j, z in enumerate(zs):
        for i, x in enumerate(xs):
            out[j, i] = nav.is_navigable(np.array([x, nav.floor_height, z]))
    return out


def points_to_pixels(
    points: np.ndarray, nav: NavGrid, meters_per_pixel: float = 0.05
) -> np.ndarray:
    """(N, 3) world points → (N, 2) pixel (col, row) on the top-down map
    (convert_points_to_topdown parity)."""
    lo, _ = nav.get_bounds()
    pts = np.atleast_2d(np.asarray(points))
    px = (pts[:, 0] - lo[0]) / meters_per_pixel
    pz = (pts[:, 2] - lo[2]) / meters_per_pixel
    return np.stack([px, pz], axis=1)


def topdown_map_cached(nav: NavGrid, meters_per_pixel: float) -> np.ndarray:
    """Per-scene memo of the navigability raster: the Python is_navigable
    sweep costs ~100 ms and the map is identical for every mixture of a
    scene. Stored on the NavGrid instance so the memo's lifetime tracks
    the scene's (a module-level id(nav) key can serve a stale raster once
    the address is recycled, and never frees)."""
    cache = getattr(nav, "_topdown_cache", None)
    if cache is None:
        cache = {}
        nav._topdown_cache = cache
    grid = cache.get(meters_per_pixel)
    if grid is None:
        grid = topdown_map(nav, meters_per_pixel)
        cache[meters_per_pixel] = grid
    return grid


def save_trace_image(
    filename: str | Path,
    nav: NavGrid,
    trajectories: list[np.ndarray] | None = None,
    mic_points: np.ndarray | None = None,
    static_points: np.ndarray | None = None,
    meters_per_pixel: float = 0.05,
    scale: int = 4,
) -> None:
    """Render the navigable area with speaker trajectories, mic and
    noise/music markers (save_trace_gif parity — a PNG per sample,
    SonicSet_train.py:47).

    Drawn with PIL (a matplotlib figure+savefig measured ~300 ms per
    mixture — a third of the generation budget); falls back to the
    matplotlib path when PIL is unavailable."""
    try:
        from PIL import Image, ImageDraw
    except ImportError:
        return _save_trace_image_mpl(
            filename, nav, trajectories, mic_points, static_points,
            meters_per_pixel,
        )

    img, _ = _draw_trace_pil(
        nav, trajectories, mic_points, static_points, meters_per_pixel,
        scale,
    )
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    img.save(filename)


_TRACE_COLORS = [(214, 39, 40), (31, 119, 180), (44, 160, 44),
                 (255, 127, 14)]


def _draw_trace_pil(
    nav, trajectories, mic_points, static_points, meters_per_pixel, scale
):
    """Shared PIL rendering for the static trace and the GIF frames:
    navigable raster + full paths + mic/static markers. Returns the
    image and the world→pixel mapper."""
    from PIL import Image, ImageDraw

    grid = topdown_map_cached(nav, meters_per_pixel)
    h, w = grid.shape
    base = np.where(grid[..., None], np.uint8(235), np.uint8(64)).repeat(
        3, axis=2
    )
    img = Image.fromarray(base[::-1]).resize(  # origin="lower" parity
        (w * scale, h * scale), Image.NEAREST
    )
    dr = ImageDraw.Draw(img)

    def to_xy(points):
        pix = points_to_pixels(np.atleast_2d(points), nav, meters_per_pixel)
        # Cell centers of the vertically-flipped raster: row p[1] of an
        # h-row grid lands at flipped row h-1-p[1]; +0.5 centers within
        # the scale-pixel cell (matches the mpl path's origin="lower"
        # pixel-center plotting).
        return [
            ((float(p[0]) + 0.5) * scale,
             (float(h - 1 - p[1]) + 0.5) * scale)
            for p in pix
        ]

    for k, traj in enumerate(trajectories or []):
        xy = to_xy(np.asarray(traj))
        c = _TRACE_COLORS[k % len(_TRACE_COLORS)]
        if len(xy) > 1:
            dr.line(xy, fill=c, width=2)
        for x, y in xy:
            dr.ellipse([x - 3, y - 3, x + 3, y + 3], fill=c)
    if mic_points is not None:
        for x, y in to_xy(mic_points):
            dr.regular_polygon((x, y, 10), 5, rotation=0,
                               fill=(255, 215, 0), outline=(0, 0, 0))
    if static_points is not None:
        for x, y in to_xy(static_points):
            dr.rectangle([x - 5, y - 5, x + 5, y + 5], fill=(255, 0, 255),
                         outline=(0, 0, 0))
    return img, to_xy


def save_trace_gif(
    filename: str | Path,
    nav: NavGrid,
    trajectories: list[np.ndarray] | None = None,
    mic_points: np.ndarray | None = None,
    static_points: np.ndarray | None = None,
    meters_per_pixel: float = 0.05,
    scale: int = 4,
    fps: float = 5.0,
) -> None:
    """Animated trajectory trace (save_trace_gif,
    SonicSim_rir.py:990-1020): frame f highlights every speaker at its
    f-th waypoint over the full-path base image; shorter trajectories
    hold their final position. Falls back to the static PNG when PIL is
    unavailable."""
    try:
        from PIL import ImageDraw
    except ImportError:
        # matplotlib's Agg writer cannot encode GIF — degrade to a
        # static PNG sibling instead of crashing on fig.savefig(.gif).
        png = Path(filename).with_suffix(".png")
        return _save_trace_image_mpl(
            png, nav, trajectories, mic_points, static_points,
            meters_per_pixel,
        )

    base, to_xy = _draw_trace_pil(
        nav, trajectories, mic_points, static_points, meters_per_pixel,
        scale,
    )
    trajs = [np.asarray(t) for t in (trajectories or [])]
    n_frames = max((len(t) for t in trajs), default=1)
    frames = []
    for f in range(n_frames):
        frame = base.copy()
        dr = ImageDraw.Draw(frame)
        for k, traj in enumerate(trajs):
            x, y = to_xy(traj[min(f, len(traj) - 1)])[0]
            c = _TRACE_COLORS[k % len(_TRACE_COLORS)]
            dr.ellipse([x - 7, y - 7, x + 7, y + 7], fill=c,
                       outline=(0, 0, 0), width=2)
        frames.append(frame)
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        filename,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )


def _save_trace_image_mpl(
    filename: str | Path,
    nav: NavGrid,
    trajectories: list[np.ndarray] | None = None,
    mic_points: np.ndarray | None = None,
    static_points: np.ndarray | None = None,
    meters_per_pixel: float = 0.05,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = topdown_map_cached(nav, meters_per_pixel)
    fig, ax = plt.subplots(figsize=(8, 8 * grid.shape[0] / max(grid.shape[1], 1)))
    ax.imshow(grid, cmap="gray", origin="lower", interpolation="nearest")
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange"]
    for k, traj in enumerate(trajectories or []):
        pix = points_to_pixels(np.asarray(traj), nav, meters_per_pixel)
        ax.plot(pix[:, 0], pix[:, 1], "-o", ms=3, color=colors[k % len(colors)],
                label=f"speaker {k + 1}")
    if mic_points is not None:
        pix = points_to_pixels(mic_points, nav, meters_per_pixel)
        ax.scatter(pix[:, 0], pix[:, 1], marker="*", s=200, c="gold", label="mic",
                   edgecolors="k", zorder=5)
    if static_points is not None:
        pix = points_to_pixels(static_points, nav, meters_per_pixel)
        ax.scatter(pix[:, 0], pix[:, 1], marker="s", s=80, c="magenta",
                   label="noise/music", edgecolors="k", zorder=5)
    ax.legend(loc="upper right", fontsize=8)
    ax.set_axis_off()
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(filename, bbox_inches="tight", dpi=120)
    plt.close(fig)

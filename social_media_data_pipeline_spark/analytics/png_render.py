"""PNG chart rendering — the pixel twin of `analytics/report.py`,
closing the `Exploration/plotting.py:96-316` artifact gap (the
reference saves matplotlib figures; a thesis user keeps the .png).

Backend policy: `matplotlib` is used when importable (`backend="auto"`)
— it is NOT shipped in this container, so the default path is a
dependency-free numpy rasterizer writing real PNGs through
`sources.binary.encode_png` (verified in tests by round-tripping
through the repo's own PNG decoder). Both backends consume the SAME
already-aggregated DataFrames as the text renderers: everything
data-sized stays distributed; only the bounded aggregate collects
(`_collect_capped`, explicit `max_rows`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from social_media_data_pipeline_spark.analytics.report import _collect_capped

# classic well-separated categorical colors (matplotlib's public
# default cycle), dark-on-white
_SERIES_RGB = [(31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40)]
_AXIS = (60, 60, 60)
_GRID = (225, 225, 225)
_BG = (255, 255, 255)

# 5x7 bitmap glyphs (bit 4 = leftmost pixel) — enough for numeric tick
# labels in scientific notation
_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    "e": (0x00, 0x00, 0x0E, 0x11, 0x1F, 0x10, 0x0E),
    " ": (0,) * 7,
}


def _have_matplotlib() -> bool:
    try:  # pragma: no cover - matplotlib absent in the target container
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def _canvas(w: int, h: int):
    import numpy as np

    c = np.empty((h, w, 3), dtype=np.uint8)
    c[:] = _BG
    return c


def _text(canvas, x: int, y: int, s: str, color=_AXIS) -> None:
    h, w = canvas.shape[:2]
    for ch in s:
        glyph = _FONT.get(ch, _FONT[" "])
        for r, bits in enumerate(glyph):
            for cbit in range(5):
                if bits & (1 << (4 - cbit)):
                    yy, xx = y + r, x + cbit
                    if 0 <= yy < h and 0 <= xx < w:
                        canvas[yy, xx] = color
        x += 6


def _polyline(canvas, pts, color) -> None:
    import numpy as np

    h, w = canvas.shape[:2]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        n = max(2, int(max(abs(x1 - x0), abs(y1 - y0))) * 2)
        xs = np.clip(np.round(np.linspace(x0, x1, n)).astype(int), 0, w - 1)
        ys = np.clip(np.round(np.linspace(y0, y1, n)).astype(int), 0, h - 1)
        canvas[ys, xs] = color
        # thicken vertically for visibility
        canvas[np.clip(ys + 1, 0, h - 1), xs] = color


def _fmt_tick(v: float) -> str:
    s = f"{v:.3g}"
    return s.replace("E", "e")


def _frame_axes(canvas, left: int, top: int, right: int, bottom: int,
                y_lo: float, y_hi: float, n_ticks: int = 5) -> None:
    canvas[top : bottom + 1, left] = _AXIS
    canvas[bottom, left : right + 1] = _AXIS
    for i in range(n_ticks):
        fy = i / (n_ticks - 1)
        y = round(bottom - fy * (bottom - top))
        canvas[y, left + 1 : right + 1] = _GRID
        canvas[y, left - 2 : left] = _AXIS
        _text(canvas, 2, y - 3, _fmt_tick(y_lo + fy * (y_hi - y_lo)))


def timeseries_png(
    df: DataFrame,
    time_col: str,
    value_col: str,
    path: str,
    smooth_sigma: float | None = None,
    width: int = 640,
    height: int = 320,
    max_rows: int = 2000,
    backend: str = "auto",
) -> str:
    """`plot_timeseries_histogram` parity as pixels: per-bucket bars +
    optional distributed-gaussian trendline. Returns `path`."""
    work = df
    if smooth_sigma is not None:
        from social_media_data_pipeline_spark.analytics.smoothing import smooth_series

        work = smooth_series(df, time_col, value_col, sigma=smooth_sigma)
    rows, _ = _collect_capped(work, [time_col], max_rows)
    vals = [float(r[value_col] or 0.0) for r in rows]
    trend = [float(r["smoothed"]) for r in rows] if smooth_sigma is not None else None
    if backend == "mpl" or (backend == "auto" and _have_matplotlib()):
        return _mpl_timeseries(rows, time_col, vals, trend, path, width, height)
    return _raster_timeseries(vals, trend, path, width, height)


def _raster_timeseries(vals, trend, path, width, height) -> str:
    canvas = _canvas(width, height)
    left, top, right, bottom = 46, 10, width - 10, height - 16
    y_hi = max(max(vals, default=0.0), max(trend or [0.0]), 1e-12)
    _frame_axes(canvas, left, top, right, bottom, 0.0, y_hi)
    n = max(1, len(vals))
    span = right - left - 2
    bar_w = max(1, span // max(n, 1) - 1)
    for i, v in enumerate(vals):
        x0 = left + 1 + round(i * span / n)
        y0 = round(bottom - (max(v, 0.0) / y_hi) * (bottom - top))
        canvas[y0:bottom, x0 : x0 + bar_w] = _SERIES_RGB[0]
    if trend is not None:
        pts = [
            (left + 1 + round((i + 0.5) * span / n),
             round(bottom - (max(t, 0.0) / y_hi) * (bottom - top)))
            for i, t in enumerate(trend)
        ]
        _polyline(canvas, pts, _SERIES_RGB[3])
    return _write(canvas, path)


def catplot_png(
    df: DataFrame,
    label_col: str,
    value_col: str,
    path: str,
    width: int = 640,
    height: int = 320,
    max_rows: int = 60,
    backend: str = "auto",
) -> str:
    """`catplot` parity as pixels: per-category vertical bars in cycle
    colors with numeric value ticks. Returns `path`."""
    rows, _ = _collect_capped(df, [label_col], max_rows)
    vals = [float(r[value_col] or 0.0) for r in rows]
    if backend == "mpl" or (backend == "auto" and _have_matplotlib()):
        return _mpl_catplot(rows, label_col, vals, path, width, height)
    canvas = _canvas(width, height)
    left, top, right, bottom = 46, 10, width - 10, height - 16
    y_hi = max(max(vals, default=0.0), 1e-12)
    _frame_axes(canvas, left, top, right, bottom, 0.0, y_hi)
    n = max(1, len(vals))
    span = right - left - 2
    bar_w = max(1, round(span / n * 0.8))
    for i, v in enumerate(vals):
        x0 = left + 1 + round((i + 0.1) * span / n)
        y0 = round(bottom - (max(v, 0.0) / y_hi) * (bottom - top))
        canvas[y0:bottom, x0 : x0 + bar_w] = _SERIES_RGB[i % len(_SERIES_RGB)]
    return _write(canvas, path)


def _write(canvas, path: str) -> str:
    from social_media_data_pipeline_spark.sources.binary import encode_png

    h, w = canvas.shape[:2]
    with open(path, "wb") as f:
        f.write(encode_png(w, h, canvas.tobytes()))
    return path


# -- matplotlib backend (optional; exercised only where the library exists) --


def _mpl_timeseries(rows, time_col, vals, trend, path, width, height) -> str:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(width / 100, height / 100), dpi=100)
    xs = [str(r[time_col]) for r in rows]
    ax.bar(xs, vals, color="#1f77b4")
    if trend is not None:
        ax.plot(xs, trend, color="#d62728")
    ax.tick_params(axis="x", rotation=90, labelsize=6)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def _mpl_catplot(rows, label_col, vals, path, width, height) -> str:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(width / 100, height / 100), dpi=100)
    xs = [str(r[label_col]) for r in rows]
    ax.bar(xs, vals, color=[f"C{i % 10}" for i in range(len(xs))])
    ax.tick_params(axis="x", rotation=45, labelsize=7)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path

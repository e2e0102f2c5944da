"""Cluster visualization: scatter + size bar chart as PNG files.

Parity surface for the reference's plotters-based charts (viz.rs:20-115
scatter, viz.rs:118-160 bar chart, viz.rs:199-213 report orchestration):
same canvas sizes (800×600 / 600×400), white background, the same 5-color
cluster palette (RED, BLUE, GREEN, YELLOW, MAGENTA — viz.rs:8), ±0.5 data
padding, r=4 filled point circles, ±0.1 centroid squares, axis
descriptions, and the ``<base>.png`` / ``<base>_sizes.png`` naming
(main.rs:155-158).

The container has no matplotlib/PIL, so rendering is a small pure-Python
rasterizer + stdlib-zlib PNG encoder (no dependencies). Rendering is
inherently a driver-side act on already-aggregated/sampled data: the
scatter reads at most ``sample_n`` assignment rows (the per-customer
table is post-aggregation and tiny relative to raw events; at 100 TB you
sample — a billion overplotted points is not a chart).
"""

from __future__ import annotations

import math
import struct
import zlib

# ---------------------------------------------------------------------------
# PNG encoding (stdlib only)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path: str, width: int, height: int, rgb: bytearray) -> None:
    """Write an 8-bit RGB buffer (row-major, 3 bytes/px) as a PNG file."""
    raw = bytearray()
    stride = width * 3
    for y in range(height):
        raw.append(0)  # filter type None
        raw += rgb[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(b"IHDR", ihdr))
        f.write(_png_chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
        f.write(_png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# 5×7 bitmap font (uppercase + digits + punctuation), rows as 5-bit ints
# ---------------------------------------------------------------------------

_FONT: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x0C, 0x0C),
    ",": (0, 0, 0, 0, 0x0C, 0x04, 0x08),
    "-": (0, 0, 0, 0x1F, 0, 0, 0),
    ":": (0, 0x0C, 0x0C, 0, 0x0C, 0x0C, 0),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "%": (0x18, 0x19, 0x02, 0x04, 0x08, 0x13, 0x03),
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
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
}

#: reference palette, viz.rs:8 — RED, BLUE, GREEN, YELLOW, MAGENTA
CLUSTER_COLORS: tuple[tuple[int, int, int], ...] = (
    (255, 0, 0),
    (0, 0, 255),
    (0, 255, 0),
    (255, 255, 0),
    (255, 0, 255),
)
BLACK = (0, 0, 0)
GRID = (220, 220, 220)


class _Canvas:
    def __init__(self, width: int, height: int):
        self.w, self.h = width, height
        self.buf = bytearray(b"\xff" * (width * height * 3))

    def set(self, x: int, y: int, color) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.buf[i : i + 3] = bytes(color)

    def fill_rect(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        for y in range(max(0, min(y0, y1)), min(self.h, max(y0, y1) + 1)):
            for x in range(max(0, min(x0, x1)), min(self.w, max(x0, x1) + 1)):
                self.set(x, y, color)

    def hline(self, x0: int, x1: int, y: int, color) -> None:
        self.fill_rect(x0, y, x1, y, color)

    def vline(self, x: int, y0: int, y1: int, color) -> None:
        self.fill_rect(x, y0, x, y1, color)

    def circle(self, cx: int, cy: int, r: int, color) -> None:
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy <= r * r:
                    self.set(cx + dx, cy + dy, color)

    def text(self, x: int, y: int, s: str, color=BLACK, scale: int = 1, vertical: bool = False) -> None:
        """Top-left anchored 5×7 text; ``vertical`` rotates 90° CCW."""
        cx = 0
        for ch in s.upper():
            rows = _FONT.get(ch, _FONT[" "])
            for ry, row in enumerate(rows):
                for rx in range(5):
                    if row & (1 << (4 - rx)):
                        px, py = cx + rx, ry
                        for sy in range(scale):
                            for sx in range(scale):
                                gx, gy = px * scale + sx, py * scale + sy
                                if vertical:
                                    self.set(x + gy, y - gx, color)
                                else:
                                    self.set(x + gx, y + gy, color)
            cx += 6
        return

    def text_width(self, s: str, scale: int = 1) -> int:
        return len(s) * 6 * scale - scale


def _nice_ticks(lo: float, hi: float, target: int = 6) -> list[float]:
    span = hi - lo
    if span <= 0 or not math.isfinite(span):
        return [lo]
    raw = span / target
    mag = 10 ** math.floor(math.log10(raw))
    for m in (1, 2, 5, 10):
        if raw <= m * mag:
            step = m * mag
            break
    first = math.ceil(lo / step) * step
    ticks, t = [], first
    while t <= hi + 1e-9 * span:
        ticks.append(round(t, 10))
        t += step
    return ticks


def _fmt(v: float) -> str:
    if v == int(v):
        return str(int(v))
    return f"{v:.2f}".rstrip("0").rstrip(".")


class _Chart:
    """Cartesian chart area with margins, mesh, axis descriptions."""

    def __init__(self, canvas: _Canvas, title: str, xlim, ylim,
                 margin=10, caption_h=40, x_label_area=50, y_label_area=60):
        self.c = canvas
        self.x0 = margin + y_label_area
        self.x1 = canvas.w - margin
        self.y0 = margin + caption_h
        self.y1 = canvas.h - margin - x_label_area
        self.xlim, self.ylim = xlim, ylim
        # caption, 2× font ≈ plotters ("sans-serif", 30)
        self.c.text(max(margin, (canvas.w - self.c.text_width(title, 2)) // 2),
                    margin, title, BLACK, scale=2)

    def px(self, x: float) -> int:
        lo, hi = self.xlim
        return self.x0 + int(round((x - lo) / (hi - lo) * (self.x1 - self.x0)))

    def py(self, y: float) -> int:
        lo, hi = self.ylim
        return self.y1 - int(round((y - lo) / (hi - lo) * (self.y1 - self.y0)))

    def fill_rect_clipped(self, xa: int, ya: int, xb: int, yb: int, color) -> None:
        """Rect clipped to the chart area (plotters clips marks there too)."""
        cx = lambda v: max(self.x0, min(self.x1, v))
        cy = lambda v: max(self.y0, min(self.y1, v))
        self.c.fill_rect(cx(xa), cy(ya), cx(xb), cy(yb), color)

    def mesh(self, x_desc: str, y_desc: str) -> None:
        for t in _nice_ticks(*self.xlim):
            x = self.px(t)
            self.c.vline(x, self.y0, self.y1, GRID)
            lbl = _fmt(t)
            self.c.text(x - self.c.text_width(lbl) // 2, self.y1 + 5, lbl)
        for t in _nice_ticks(*self.ylim):
            y = self.py(t)
            self.c.hline(self.x0, self.x1, y, GRID)
            lbl = _fmt(t)
            self.c.text(self.x0 - 7 - self.c.text_width(lbl), y - 3, lbl)
        # axes frame
        self.c.hline(self.x0, self.x1, self.y1, BLACK)
        self.c.vline(self.x0, self.y0, self.y1, BLACK)
        # axis descriptions
        self.c.text((self.x0 + self.x1 - self.c.text_width(x_desc)) // 2,
                    self.c.h - 14, x_desc)
        self.c.text(8, (self.y0 + self.y1 + self.c.text_width(y_desc)) // 2,
                    y_desc, vertical=True)


def create_cluster_visualization(
    points_xy: list[tuple[float, float]],
    labels: list[int],
    centroids_xy: list[tuple[float, float]],
    output_path: str,
    plot_title: str | None = None,
) -> None:
    """Scatter of (frequency_z, monetary_z) colored by cluster, with
    centroid squares — viz.rs:20-115 geometry (800×600, ±0.5 padding,
    r=4 circles, ±0.1-data-unit centroid squares, palette viz.rs:8)."""
    title = plot_title or "Customer Segmentation: Frequency vs Monetary (Colored by Cluster)"
    xs = [p[0] for p in points_xy] or [0.0]
    ys = [p[1] for p in points_xy] or [0.0]
    xlim = (min(xs) - 0.5, max(xs) + 0.5)
    ylim = (min(ys) - 0.5, max(ys) + 0.5)
    c = _Canvas(800, 600)
    ch = _Chart(c, title, xlim, ylim)
    ch.mesh("Frequency (Normalized)", "Monetary (Normalized)")
    for (x, y), lab in zip(points_xy, labels):
        color = CLUSTER_COLORS[lab] if 0 <= lab < len(CLUSTER_COLORS) else BLACK
        c.circle(ch.px(x), ch.py(y), 4, color)
    half = 0.1
    for i, (x, y) in enumerate(centroids_xy):
        color = CLUSTER_COLORS[i] if i < len(CLUSTER_COLORS) else BLACK
        ch.fill_rect_clipped(
            ch.px(x - half), ch.py(y + half), ch.px(x + half), ch.py(y - half), color
        )
    write_png(output_path, c.w, c.h, c.buf)
    print(f"Cluster visualization saved to: {output_path}")


def create_cluster_size_chart(sizes: list[int], output_path: str) -> None:
    """Bar chart of cluster sizes — viz.rs:118-160 (600×400, bars at
    cluster_id ± 0.4, y to max·1.1)."""
    k = len(sizes)
    max_size = float(max(sizes) if sizes else 1)
    c = _Canvas(600, 400)
    ch = _Chart(c, "Cluster Sizes", (0.0, float(k)), (0.0, max_size * 1.1),
                x_label_area=40, y_label_area=50)
    ch.mesh("Cluster ID", "Number of Customers")
    for i, s in enumerate(sizes):
        color = CLUSTER_COLORS[i] if i < len(CLUSTER_COLORS) else CLUSTER_COLORS[1]
        # bars at exactly (i−0.4, i+0.4) on the 0..k range, like the
        # reference (cluster 0's bar is half-clipped there too)
        ch.fill_rect_clipped(ch.px(i - 0.4), ch.py(float(s)), ch.px(i + 0.4), ch.py(0.0), color)
    write_png(output_path, c.w, c.h, c.buf)
    print(f"Cluster size chart saved to: {output_path}")


def generate_visualization_report(result, base_output_path: str, sample_n: int = 50_000) -> tuple[str, str]:
    """Main scatter + ``_sizes`` chart from a PipelineResult
    (viz.rs:199-213). Scatter points come from the assignments frame,
    capped at ``sample_n`` rows collected to the driver (plotting is a
    driver-side act; at 100 TB you sample)."""
    xy, labels = [], []
    if result.assignments is not None:
        rows = (
            result.assignments.select("frequency_z", "monetary_z", "cluster")
            .limit(sample_n)
            .collect()
        )
        xy = [(float(r.frequency_z), float(r.monetary_z)) for r in rows]
        labels = [int(r.cluster) for r in rows]
    cen_xy = [(c[1], c[2]) for c in result.centroids]
    create_cluster_visualization(xy, labels, cen_xy, base_output_path)
    sizes_by_cluster = dict((c, s) for c, s, _ in result.cluster_sizes)
    sizes = [sizes_by_cluster.get(i, 0) for i in range(result.k)]
    sizes_path = (
        base_output_path.replace(".png", "_sizes.png")
        if base_output_path.endswith(".png")
        else base_output_path + "_sizes.png"
    )
    create_cluster_size_chart(sizes, sizes_path)
    return base_output_path, sizes_path

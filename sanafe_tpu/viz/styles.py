"""Plot style system (reference sanafe/viz/styles.py)."""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import matplotlib as mpl
from matplotlib import pyplot as plt


@dataclass
class SANAFEStyle:
    """A named bundle of matplotlib rc settings + palette."""

    name: str = "default"
    font_size: float = 10.0
    label_size: float = 11.0
    title_size: float = 12.0
    line_width: float = 1.5
    marker_size: float = 4.0
    figure_size: tuple = (6.0, 4.0)
    dpi: int = 100
    grid: bool = True
    palette: list = field(
        default_factory=lambda: [
            "#4477AA", "#EE6677", "#228833", "#CCBB44",
            "#66CCEE", "#AA3377", "#BBBBBB",
        ]
    )

    def rc_params(self) -> dict:
        return {
            "font.size": self.font_size,
            "axes.labelsize": self.label_size,
            "axes.titlesize": self.title_size,
            "lines.linewidth": self.line_width,
            "lines.markersize": self.marker_size,
            "figure.figsize": self.figure_size,
            "figure.dpi": self.dpi,
            "axes.grid": self.grid,
        }


PUBLICATION_STYLE = SANAFEStyle(
    name="publication", font_size=8, label_size=9, title_size=10,
    figure_size=(3.5, 2.5), dpi=300, grid=False,
)
PRESENTATION_STYLE = SANAFEStyle(
    name="presentation", font_size=14, label_size=16, title_size=18,
    figure_size=(10, 6), dpi=120, line_width=2.5,
)
NOTEBOOK_STYLE = SANAFEStyle(name="notebook")

_default_style = NOTEBOOK_STYLE


def set_default_style(style: SANAFEStyle) -> None:
    global _default_style
    _default_style = style


def get_default_style() -> SANAFEStyle:
    return _default_style


def apply_style(style: SANAFEStyle | None = None):
    """Context manager applying a style's rc params."""
    style = style or _default_style
    return mpl.rc_context(style.rc_params())


def get_group_colors(groups, style: SANAFEStyle | None = None) -> dict:
    """Stable color assignment for a set of group names."""
    style = style or _default_style
    palette = style.palette
    return {
        group: palette[i % len(palette)]
        for i, group in enumerate(sorted(set(groups)))
    }

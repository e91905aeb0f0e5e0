"""Evaluation-curve plotting (reference parity: ``plot.py:8-19``).

Presentation-only: the evaluation output is a tiny per-(query, step) table,
so it is collected driver-side and rendered with matplotlib — exactly the
boundary the reference draws. Gated behind an import-try because plotting
backends are not part of the engine environment.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame

try:  # pragma: no cover - optional dependency
    import matplotlib

    # Only force the headless backend when the process has no display
    # AND the user hasn't chosen one: an unconditional use('Agg') at
    # import time turned plt.show() into a silent no-op and clobbered
    # the backend for the whole process (a Jupyter user's unrelated
    # figures stopped rendering — r7 review finding). DISPLAY only
    # means anything on Linux/X11 — macOS and Windows have working GUIs
    # without it, so the no-DISPLAY heuristic must not fire there
    # (r7 ADVICE finding).
    if (
        sys.platform.startswith("linux")
        and not os.environ.get("DISPLAY")
        and not os.environ.get("WAYLAND_DISPLAY")
        and not os.environ.get("MPLBACKEND")
    ):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MATPLOTLIB = True
except Exception:  # pragma: no cover
    HAS_MATPLOTLIB = False


def plot_and_show(
    data,
    x: str,
    y: str,
    labels=None,
    axis=None,
    style: str = ".-",
    size: tuple[int, int] | None = None,
    save_path: str | None = None,
) -> None:
    """Reference-parity curve plot (reference ``plot.py:8-19``):
    ``data`` is a sequence of evaluation frames — Spark DataFrames or
    pandas frames — drawn as one line each, with ``labels`` naming the
    lines in a legend above the axes and ``axis`` passing through to
    matplotlib's axis-limit call.

    Each frame is sorted by ``x`` before drawing: Spark collect order is
    partition-arbitrary (the evaluate output ends in a groupBy), so an
    unsorted polyline would zigzag across the x axis (r7 review
    finding). Rendering uses an explicit fresh figure, never the
    process-global current figure, so repeated calls cannot stack lines
    from earlier plots.

    The one divergence from the reference is the show/save split:
    engine containers are headless, so ``save_path`` writes the figure
    to a file instead of calling ``plt.show()`` (pass nothing to get
    the reference's interactive behavior). Raises ``RuntimeError`` when
    matplotlib is unavailable.
    """
    if not HAS_MATPLOTLIB:
        raise RuntimeError(
            "matplotlib is not available in this environment; "
            "collect the evaluation frame and plot externally"
        )
    frames = [
        (line.toPandas() if isinstance(line, DataFrame) else line)
        .sort_values(x)
        for line in data
    ]
    fig, ax = plt.subplots(figsize=size)
    handles = [ax.plot(f[x], f[y], style)[0] for f in frames]
    if axis is not None:
        # `is not None`, not truthiness: ax.axis(False) (hide axes) and
        # ax.axis(0) are valid matplotlib arguments a truthiness test
        # silently swallowed
        ax.axis(axis)
    if labels:
        ax.legend(
            handles, labels,
            bbox_to_anchor=(0.0, 1.02, 1.0, 0.102), loc=10,
            ncol=3, borderaxespad=0.0, frameon=False, fontsize=8,
        )
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover - interactive backend only
        plt.show()


def plot_and_save(
    data: DataFrame,
    x: str,
    y: str,
    path: str,
    labels: str | None = None,
    style: str = ".-",
    size: tuple[int, int] | None = None,
) -> None:
    """Line plot of evaluation curves, one line per ``labels`` value.

    Spark-side work is just the (small) collect of the evaluation output;
    rendering is pure driver-side matplotlib. Every line is sorted by
    ``x`` (collect order is partition-arbitrary). Raises ``RuntimeError``
    when matplotlib is unavailable (not installed in the engine
    container).
    """
    if not HAS_MATPLOTLIB:
        raise RuntimeError(
            "matplotlib is not available in this environment; "
            "collect the evaluation frame and plot externally"
        )
    pdf = data.toPandas()
    fig, axis = plt.subplots(figsize=size)
    if labels is None:
        pdf = pdf.sort_values(x)
        axis.plot(pdf[x], pdf[y], style)
    else:
        for label, group in pdf.groupby(labels):
            group = group.sort_values(x)
            axis.plot(group[x], group[y], style, label=str(label))
        axis.legend()
    axis.set_xlabel(x)
    axis.set_ylabel(y)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)

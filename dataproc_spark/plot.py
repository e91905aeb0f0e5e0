"""Evaluation-curve plotting (reference parity: ``plot.py:8-19``).

Presentation-only: the evaluation output is a tiny per-(query, step) table,
so it is collected driver-side and rendered with matplotlib — exactly the
boundary the reference draws. Gated behind an import-try because plotting
backends are not part of the engine environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # pragma: no cover - optional dependency
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MATPLOTLIB = True
except Exception:  # pragma: no cover
    HAS_MATPLOTLIB = False


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
    rendering is pure driver-side matplotlib. Raises ``RuntimeError`` when
    matplotlib is unavailable (not installed in the engine container).
    """
    if not HAS_MATPLOTLIB:
        raise RuntimeError(
            "matplotlib is not available in this environment; "
            "collect the evaluation frame and plot externally"
        )
    pdf = data.toPandas()
    fig, axis = plt.subplots(figsize=size)
    if labels is None:
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

"""Driver-side report artifacts (SURVEY.md §2.1 S11 — plot sinks).

The reference renders matplotlib charts of small aggregates
(/root/reference/visualizations.py:89-99). Charting is out of engine
scope by design: the engine's job ends at a *small* aggregated
DataFrame; rendering happens driver-side on `toPandas()` of that
result. These helpers enforce the contract (bounded row count before
collect) and gate matplotlib behind an import-try since plotting
libraries aren't part of the engine's runtime contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: refuse to collect unbounded results for plotting
MAX_PLOT_ROWS = 10_000


def collect_for_report(df: DataFrame, max_rows: int = MAX_PLOT_ROWS):
    """toPandas() with a hard row bound — a report source must be an
    aggregate, never a fact table."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"report source has >{max_rows} rows — aggregate it first "
            "(plot sinks are for small results, SURVEY §2.1 S11)")
    return df.toPandas()


def save_line_chart(df: DataFrame, x: str, y: str, path: str,
                    title: str = "") -> str:
    """Line chart of a small result (the reference's monthly
    sales-trend PNG, visualizations.py:89-99). Requires matplotlib —
    raises ImportError with guidance when unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "matplotlib is not installed in this environment; "
            "install it to render report charts (the engine-side "
            "aggregation works without it)") from e
    pdf = collect_for_report(df).sort_values(x)
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(pdf[x], pdf[y], marker="o")
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if title:
        ax.set_title(title)
    fig.autofmt_xdate()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path

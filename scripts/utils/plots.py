"""Paper-style plots of eval metrics (reference scripts/utils/plots.py):
mel-loss boxplots + FAD bars per condition from a metrics-all.csv."""
from __future__ import annotations


def plot_metrics(metrics, condition_to_latex, title, color_palette):
    import matplotlib.pyplot as plt
    from pandas.api.types import CategoricalDtype

    metrics = metrics.copy()
    metrics["condition_latex"] = metrics["condition"].map(condition_to_latex)
    cat_type = CategoricalDtype(categories=list(condition_to_latex.values()), ordered=True)
    metrics["condition_latex"] = metrics["condition_latex"].astype(cat_type)

    grouped = metrics.groupby("condition_latex", observed=False)[["mel", "frechet"]].agg(
        ["mean", "std"]
    )
    fig, axs = plt.subplots(2, 1, figsize=(7, 5.25))
    fig.suptitle(title, fontsize=16)
    bar_colors = [color_palette.get(c, "gray") for c in grouped.index]

    # mel boxplot per condition
    conds = list(grouped.index)
    data = [metrics.loc[metrics["condition_latex"] == c, "mel"] for c in conds]
    axs[0].boxplot(data, tick_labels=conds, showfliers=False)
    axs[0].set_ylabel("Mel Spectrogram Loss ←")

    axs[1].bar(
        grouped.index, grouped["frechet"]["mean"], yerr=grouped["frechet"]["std"],
        color=bar_colors,
    )
    axs[1].set_ylabel("FAD ←")
    plt.tight_layout(rect=[0, 0, 1, 0.96])
    return fig

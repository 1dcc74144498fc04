"""Mean-centered comparison barplots per task x metric x dimension.

Behavior parity with the reference (reference:
evaluation/visualization/ds_task_barplots.py:14-191): per dataset df the
metric column is centered on its mean (sign-flipped for lower-better),
grouped by the chosen dimension (pred_model / unc_type / aggregation) with
config-driven filters, colors, hatches and ordering; seaborn-styled bars
with std error bars saved as PNG.
"""
from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Dict

import numpy as np
import pandas as pd

from .ds_task_table import DsTaskTable


def generate_barplot(ds_task: str, metric: str, dimension: str,
                     dataset_dfs: Dict[str, pd.DataFrame],
                     results_plot_dir: Path, lower_better: bool = False,
                     percent: bool = False, df_naming=None, coloring=None,
                     hatches=None, ordering=None, filter_index=None) -> Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    all_mean_dfs, all_std_dfs = [], []
    for df_name, df in dataset_dfs.items():
        if filter_index:
            for dim_name, dim_value in filter_index:
                df = df.loc[df.index.get_level_values(
                    ("", dim_name)) != dim_value]
        mean_ds = df.loc[:, (ds_task, metric)].mean()
        df.loc[:, (ds_task, metric)] -= mean_ds
        if lower_better:
            df.loc[:, (ds_task, metric)] *= -1
        plot_name = (df_naming or {}).get(df_name, df_name)
        mu = round(mean_ds, 2) if percent else round(mean_ds / 100, 2)
        label = f"{plot_name} \n (µ: {round(mu, 2)})"
        grouped = df[(ds_task, metric)].groupby(("", dimension))
        all_mean_dfs.append(grouped.mean().rename(label).to_frame())
        all_std_dfs.append(grouped.std().rename(label).to_frame())

    dfs_mean = pd.concat(all_mean_dfs, axis=1).dropna(how="all")
    dfs_std = pd.concat(all_std_dfs, axis=1).dropna(how="all")
    if ordering and dimension in ordering:
        order = [o for o in ordering[dimension] if o in dfs_mean.index]
        dfs_mean = dfs_mean.reindex(order)
        dfs_std = dfs_std.reindex(order)

    sns.set_style("whitegrid")
    colors = dict(coloring[dimension]) if (coloring
                                           and dimension in coloring) else None
    hatch = dict(hatches[dimension]) if (hatches
                                         and dimension in hatches) else None
    ax = dfs_mean.T.plot.bar(yerr=dfs_std.T, capsize=4, figsize=(5, 6),
                             color=colors, fontsize=19)
    if hatch:
        hatch_list = np.array(
            [[hatch.get(k, "") for _ in dfs_mean.columns]
             for k in dfs_mean.index]).flatten()
        for bar, h in zip(ax.patches, hatch_list):
            bar_color = bar.get_fc()
            bar.set_facecolor((bar_color[0], bar_color[1], bar_color[2],
                               0.6))
            bar.set_hatch(h)
            bar._hatch_color = bar_color

    plt.ylabel(" ".join(metric.split(" ")[0].split("_")), fontsize=19)
    plt.xticks(rotation=0)
    ticks = ax.get_yticks().tolist()
    ax.set_yticks(ticks)
    scale = 1.0 if percent else 100.0
    ax.set_yticklabels([round(t / scale, 3) if float(t) != 0.0 else "µ"
                        for t in ticks])
    plt.axhline(y=0.0, color="black", linestyle="-")
    out_dir = Path(results_plot_dir) / dimension
    os.makedirs(out_dir, exist_ok=True)
    out_path = out_dir / f"{'_'.join(metric.lower().split(' '))}.png"
    if ax.get_legend() is not None:
        ax.get_legend().remove()
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()
    return out_path


def run_plots(plot_config: Dict) -> None:
    import warnings
    warnings.simplefilter(action="ignore",
                          category=pd.errors.PerformanceWarning)
    pd.set_option("mode.chained_assignment", None)

    dataset_dfs: Dict[str, pd.DataFrame] = {}
    for dataset, table_config in plot_config["datasets"].items():
        table = DsTaskTable(table_config)
        mean_df, _ = table.create()
        if table_config.get("split_param"):
            for split_value in table_config["split_param"]["split_values"]:
                dataset_dfs[f"{dataset} {split_value.title()}"] = \
                    mean_df.loc[split_value]
        else:
            dataset_dfs[dataset] = mean_df

    for ds_task, task_config in plot_config["ds_tasks"].items():
        for metric, metric_config in task_config.items():
            for dimension in metric_config["levels"]:
                filter_ds = None
                if "filter" in metric_config and dimension in \
                        metric_config["filter"]:
                    filter_ds = [
                        (filter_dim, value)
                        for filter_dim, values in
                        metric_config["filter"][dimension].items()
                        for value in values]
                metric_names = (
                    [f"{metric} {s}"
                     for s in metric_config["dataset_splits"]]
                    if metric_config["dataset_splits"] is not None
                    else [metric])
                for metric_name in metric_names:
                    generate_barplot(
                        ds_task=ds_task, metric=metric_name,
                        dimension=dimension,
                        dataset_dfs=copy.deepcopy(dataset_dfs),
                        lower_better=not metric_config["higher_better"],
                        percent=metric_config.get("percent", False),
                        filter_index=filter_ds,
                        df_naming=plot_config.get("df_naming"),
                        coloring=plot_config.get("coloring"),
                        hatches=plot_config.get("hatches"),
                        ordering=plot_config.get("ordering"),
                        results_plot_dir=Path(plot_config["save_path"]))


def main(argv=None) -> None:
    import argparse
    from ...config import compose
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-dir", "-cd", default="configs/evaluation")
    parser.add_argument("--config-name", "-cn", default="plot_config")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = compose(args.config_dir, args.config_name, args.overrides)
    run_plots(cfg.to_container())


if __name__ == "__main__":
    main()

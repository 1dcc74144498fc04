"""Results table: (pred_model, unc_measure, unc_type, aggregation) x
(task, metric split) MultiIndex DataFrame, mean ± std across seeds, styled
LaTeX output.

Behavior parity with the reference (reference:
evaluation/visualization/ds_task_table.py:14-533):

- versions grouped by the naming scheme minus the seed placeholder,
- per-metric registry entries {metrics_file_name, metrics_key,
  dataset_splits, levels, higher_better} (tasks/table_tasks.yaml),
- unc-measure relabeling: Softmax -> MSR; SSN swaps MI/EE; everyone else
  PE/EE/MI (:297-313),
- x100 scaling, ``mean±std`` cell formatting, per-column YlOrRd background
  gradients (reversed for higher-better), thickened hlines.
"""
from __future__ import annotations

import json
from itertools import groupby, product
from pathlib import Path
from typing import Dict, List

import numpy as np
import pandas as pd

from ..experiment_version import ExperimentVersion


class DsTaskTable:
    def __init__(self, config: Dict):
        self.base_path = Path(config["base_path"])
        self.versions = self._init_versions(config)
        self.grouped_versions = self._group_versions("seed")
        self.split_param = config.get("split_param")
        self.ds_tasks = config["ds_tasks"]

    # -- version grid ----------------------------------------------------
    def _init_versions(self, config) -> List[ExperimentVersion]:
        versions = []
        for experiment in config["experiments"]:
            iter_lists = [[(k, v) for v in values]
                          for k, values in experiment["iter_params"].items()]
            for params in product(*iter_lists):
                version_params = {k: v for k, v in params}
                exp_config = {k: v for k, v in experiment.items()
                              if k != "iter_params"}
                version_params.update(exp_config)
                version_params["base_path"] = self.base_path
                version_params.update(dict(
                    experiment["prediction_models"][
                        version_params["pred_model"]]))
                version_params.pop("prediction_models", None)
                versions.append(ExperimentVersion(**version_params))
        return versions

    def _group_key(self, version: ExperimentVersion, param: str):
        scheme = version.naming_scheme_version.replace(
            f"{param}{{{param}}}", "")
        return version.pred_model, scheme.format(**version.version_params)

    def _group_versions(self, param: str) -> List[List[ExperimentVersion]]:
        return [list(group) for _, group in groupby(
            self.versions, key=lambda v: self._group_key(v, param))]

    # -- table skeleton ---------------------------------------------------
    def _columns(self):
        cols = []
        for ds_task, metrics in self.ds_tasks.items():
            for metric_name, probs in metrics.items():
                splits = probs["dataset_splits"]
                if splits is not None:
                    cols.extend((ds_task, f"{metric_name} {s}")
                                for s in splits)
                else:
                    cols.append((ds_task, metric_name))
        return cols

    def get_base_df(self, grouped_versions) -> pd.DataFrame:
        rows = []
        for group in grouped_versions:
            v = group[0]
            for unc_type in v.unc_types:
                for aggregation in v.aggregations:
                    rows.append((v.pred_model, unc_type, aggregation))
        index = pd.MultiIndex.from_tuples(
            rows, names=[("", "pred_model"), ("", "unc_type"),
                         ("", "aggregation")])
        columns = pd.MultiIndex.from_tuples(self._columns())
        return pd.DataFrame(np.nan, index=index, columns=columns)

    # -- filling ----------------------------------------------------------
    @staticmethod
    def _metric_from(entry: Dict, key: str) -> float:
        if "metrics" in entry:
            return entry["metrics"][key]
        return entry[key]

    def fill_single_metric(self, mean_df, std_df, ds_task, metric_name,
                           probs, versions, dataset_split) -> None:
        metric_dicts = []
        for version in versions:
            path = version.exp_path
            if dataset_split is not None:
                path = path / dataset_split
            with open(path / probs["metrics_file_name"]) as f:
                metric_dicts.append(json.load(f))
        v = versions[0]
        col = (ds_task, f"{metric_name} {dataset_split}"
               if dataset_split is not None else metric_name)
        levels = probs["levels"]
        key = probs["metrics_key"]

        def put(selector, values):
            # full-tuple .at assignment: the row order is a preserved
            # contract (configured, not lexsorted), and partial-selector
            # .loc on an unsorted MultiIndex warns on every call
            values = np.array(values, dtype=float)
            m = float(np.mean(values))
            s = float(np.std(values, ddof=1))
            for row in mean_df.index:
                if tuple(row)[:len(selector)] == selector:
                    mean_df.at[row, col] = m
                    std_df.at[row, col] = s

        if len(levels) == 1:
            put((v.pred_model,),
                [self._metric_from(d["mean"], key) for d in metric_dicts])
        elif len(levels) == 2:
            for unc_type in v.unc_types:
                put((v.pred_model, unc_type),
                    [self._metric_from(d["mean"][unc_type], key)
                     for d in metric_dicts])
        else:
            unc_types = v.unc_types
            if metric_name == "al_improvement":
                unc_types = [u for u in unc_types
                             if u != "aleatoric_uncertainty"]
            for unc_type in unc_types:
                for aggregation in v.aggregations:
                    put((v.pred_model, unc_type, aggregation),
                        [self._metric_from(
                            d["mean"][unc_type][aggregation], key)
                         for d in metric_dicts])

    def fill_all_metrics(self, mean_df, std_df, versions) -> None:
        for ds_task, metrics in self.ds_tasks.items():
            for metric_name, probs in metrics.items():
                splits = probs["dataset_splits"] or [None]
                for dataset_split in splits:
                    self.fill_single_metric(mean_df, std_df, ds_task,
                                            metric_name, probs, versions,
                                            dataset_split)

    # -- unc-measure relabeling (ds_task_table.py:297-313) -----------------
    @staticmethod
    def get_unc_measure(row) -> str:
        pred_model, unc_type = row.name[0], row.name[1]
        if pred_model == "Softmax":
            return "MSR"
        if unc_type == "predictive_uncertainty":
            return "PE"
        if pred_model == "SSN":
            return "MI" if unc_type == "aleatoric_uncertainty" else "EE"
        return "EE" if unc_type == "aleatoric_uncertainty" else "MI"

    def _add_unc_measure(self, df: pd.DataFrame) -> pd.DataFrame:
        df[("", "unc_measure")] = df.apply(self.get_unc_measure, axis=1)
        df = df.set_index(("", "unc_measure"), append=True)
        return df.reorder_levels([("", "pred_model"), ("", "unc_measure"),
                                  ("", "unc_type"), ("", "aggregation")])

    def create_single_table(self, grouped_versions):
        mean_df = self.get_base_df(grouped_versions)
        std_df = self.get_base_df(grouped_versions)
        for group in grouped_versions:
            self.fill_all_metrics(mean_df, std_df, group)
        mean_df = self._add_unc_measure(mean_df) * 100
        std_df = self._add_unc_measure(std_df) * 100
        return mean_df, std_df

    def create(self):
        if self.split_param is not None:
            mean_dfs, std_dfs = [], []
            for split_value in self.split_param["split_values"]:
                filtered = [g for g in self.grouped_versions
                            if g[0].version_params[
                                self.split_param["name"]] == split_value]
                m, s = self.create_single_table(filtered)
                mean_dfs.append(m)
                std_dfs.append(s)
            mean_df = pd.concat(mean_dfs,
                                keys=self.split_param["split_values"])
            std_df = pd.concat(std_dfs,
                               keys=self.split_param["split_values"])
            for df in (mean_df, std_df):
                df.index.names = [self.split_param["name"],
                                  *df.index.names[1:]]
        else:
            mean_df, std_df = self.create_single_table(self.grouped_versions)
        for df in (mean_df, std_df):
            if "Dropout-Final" in df.index.get_level_values(0):
                df.rename({"Dropout-Final": "Dropout"}, axis=0, level=0,
                          inplace=True)
        return mean_df, std_df

    # -- LaTeX -------------------------------------------------------------
    @staticmethod
    def format_mean_std(mean, std):
        mean = mean.astype(float).round(2).astype(str)
        std = std.astype(float).round(2).astype(str)
        return mean.combine(std, lambda x, y: f"{x}±{y}")

    def _gradient_cells(self):
        cells, cells_reverse = [], []
        for ds_task, metrics in self.ds_tasks.items():
            for metric, probs in metrics.items():
                names = ([f"{metric} {s}" for s in probs["dataset_splits"]]
                         if probs["dataset_splits"] is not None else [metric])
                target = cells_reverse if probs["higher_better"] else cells
                target.extend((ds_task, n) for n in names)
        return cells, cells_reverse

    def to_latex(self, mean_df, std_df) -> str:
        results_df = mean_df.combine(std_df, self.format_mean_std)
        results_df.index.names = [
            n if isinstance(n, str) else n[1] for n in results_df.index.names]
        styler = results_df.style
        cells, cells_reverse = self._gradient_cells()
        for cell in cells_reverse:
            if cell in mean_df:
                styler.background_gradient(
                    axis=0, cmap="YlOrRd",
                    gmap=mean_df[cell].mul(-1).tolist(),
                    subset=pd.IndexSlice[:, [cell]])
        for cell in cells:
            if cell in mean_df:
                styler.background_gradient(
                    axis=0, cmap="YlOrRd", gmap=mean_df[cell].tolist(),
                    subset=pd.IndexSlice[:, [cell]])

        n_metric_cols = len(results_df.columns)
        column_format = ("l|" * len(results_df.index.names) + "|"
                         + "l|" * n_metric_cols)[:-1]
        latex = styler.to_latex(
            column_format=column_format, multicol_align="c",
            convert_css=True, position_float="centering", hrules=True,
            clines="skip-last;data")
        latex = latex.replace("_", r"\_")
        latex = latex.replace(r"\centering", r"\centering \tiny")
        latex = latex.replace(
            r"{\cellcolor[HTML]{000000}} \color[HTML]{F1F1F1} nan±nan",
            r"{\cellcolor[HTML]{D3D3D3}}")
        print(latex)
        return latex


def main(argv=None) -> None:
    import argparse
    from ...config import compose
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-dir", "-cd", default="configs/evaluation")
    parser.add_argument("--config-name", "-cn", default="table_config_lidc")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)
    cfg = compose(args.config_dir, args.config_name, args.overrides)
    table = DsTaskTable(cfg.to_container())
    mean_df, std_df = table.create()
    table.to_latex(mean_df, std_df)


if __name__ == "__main__":
    main()

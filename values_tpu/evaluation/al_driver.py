"""Active-learning cycle orchestration.

The reference generates second-cycle split files
(evaluation/split_file_generation/split_files_second_cycle.py) but runs
the second-cycle TRAINING out of band (cluster scripts, not in-repo).
This driver closes the loop in-process:

1. uncertainty-query split generation for every (uncertainty, aggregation)
   of an evaluated experiment (values_tpu.evaluation.split_file_generation)
   plus the random-acquisition baselines,
2. one training run per produced splits file, composed from a training
   config with ``datamodule.splits_path`` pointed at the query result and
   a version name encoding (model, uncertainty, aggregation).

CLI:
    python -m values_tpu.evaluation.al_driver \
        --splits <base_splits_dir> --config softmax_config_lidc \
        [--train-override key=value ...] [--dry-run]
      — trains on every ``secondCycle/**/splits_seed*.pkl`` under the
      base splits dir. Generate the splits first (the
      split_file_generation modules, or call ``generate_and_run()`` from
      Python to run query-generation + training in one go).
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List, Optional, Sequence


def discover_second_cycle_splits(base_splits_path) -> List[Path]:
    """All secondCycle splits files under a base splits dir, sorted for
    deterministic run order. Layout (second_cycle.py:save_splits):
    <base>/[<shift>/]secondCycle/<model>/<unc>/<agg>/splits_seed<seed>.pkl
    """
    base = Path(base_splits_path)
    return sorted(base.glob("**/secondCycle/**/splits_seed*.pkl"))


def version_name_for_splits(splits_file: Path) -> str:
    """Encode the acquisition provenance into the training version:
    secondCycle-<model>-<uncertainty>-<aggregation>-seed<N> for
    uncertainty queries, secondCycle-<type>-<type>-seed<N> for the
    random baselines (their save layout is one level shallower)."""
    parts = splits_file.parts
    idx = parts.index("secondCycle")
    provenance = parts[idx + 1:-1]
    seed = splits_file.stem.replace("splits_", "")
    return "secondCycle-" + "-".join(provenance) + f"-{seed}"


def train_second_cycle(config_name: str, splits_file,
                       overrides: Optional[Sequence[str]] = None,
                       config_dir: str = "configs",
                       fit_fn=None) -> str:
    """One second-cycle training run; returns the checkpoint path.

    ``datamodule.splits_path`` routes the queried splits into the
    datamodule (LidcDataModule accepts it; reference analog: the
    cluster scripts rewriting splits paths)."""
    from ..config import compose
    from ..training.loops import fit
    fit_fn = fit_fn or fit
    splits_file = Path(splits_file)
    cfg = compose(config_dir, config_name, [
        f"datamodule.splits_path={splits_file}",
        f"version={version_name_for_splits(splits_file)}",
    ] + list(overrides or []))
    return fit_fn(cfg)


def run_second_cycle(base_splits_path, config_name: str,
                     overrides: Optional[Sequence[str]] = None,
                     config_dir: str = "configs",
                     dry_run: bool = False, fit_fn=None) -> Dict[str, str]:
    """Train on every discovered secondCycle splits file. Returns
    {version_name: checkpoint_path} ("(dry-run)" paths when dry_run)."""
    results: Dict[str, str] = {}
    for splits_file in discover_second_cycle_splits(base_splits_path):
        version = version_name_for_splits(splits_file)
        if dry_run:
            results[version] = "(dry-run)"
            continue
        results[version] = train_second_cycle(
            config_name, splits_file, overrides=overrides,
            config_dir=config_dir, fit_fn=fit_fn)
    return results


def generate_and_run(eval_config, base_splits_path, config_name: str,
                     overrides: Optional[Sequence[str]] = None,
                     config_dir: str = "configs",
                     include_random_baselines: bool = True,
                     fit_fn=None) -> Dict[str, str]:
    """Full loop: query-split generation from an evaluated experiment,
    then second-cycle training on everything produced."""
    from .experiment_dataloader import ExperimentDataloader
    from .split_file_generation.second_cycle import generate_split_file
    from .split_file_generation.second_cycle_random import (
        generate_split_file as generate_random_split_file)

    versions = (eval_config if isinstance(eval_config, (list, tuple))
                else [eval_config])
    for version in versions:
        exp_dl = (version if isinstance(version, ExperimentDataloader)
                  else ExperimentDataloader(version))
        generate_split_file(exp_dl, base_splits_path)
        if include_random_baselines:
            generate_random_split_file(
                exp_dl, base_splits_path,
                random_types=["random", "best", "worst"])
    return run_second_cycle(base_splits_path, config_name,
                            overrides=overrides, config_dir=config_dir,
                            fit_fn=fit_fn)


def main(argv=None) -> None:
    from ..core.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(
        description="Second-cycle AL training driver")
    parser.add_argument("--splits", required=True,
                        help="base splits dir (contains firstCycle/ and "
                             "secondCycle/ trees)")
    parser.add_argument("--config", required=True,
                        help="training config name (e.g. "
                             "softmax_config_lidc)")
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--train-override", action="append", default=[],
                        help="extra config override, repeatable")
    parser.add_argument("--dry-run", action="store_true",
                        help="list the runs without training")
    args = parser.parse_args(argv)
    results = run_second_cycle(args.splits, args.config,
                               overrides=args.train_override,
                               config_dir=args.config_dir,
                               dry_run=args.dry_run)
    for version, ckpt in results.items():
        print(f"{version}: {ckpt}")
    if not results:
        print("no secondCycle splits found under", args.splits)


if __name__ == "__main__":
    main()

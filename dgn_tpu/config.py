"""Typed experiment config tree with JSON + CLI overlay.

One dataclass tree replaces the reference's per-driver pattern of a JSON
config plus ~90 lines of `if args.x is not None: config[...] = args.x`
overrides (reference main_molecules.py:205-293).  Semantics are identical:

  * the JSON file provides {gpu, model, dataset, params, net_params}
    (reference configs/*.json);
  * every CLI flag, when given, overrides the JSON value;
  * aggregators/scalers stay space-separated registry strings
    (reference nets/dgn_layer.py:334-336);
  * derived values (avg_d degree stats, inferred in_dim / n_classes) are
    computed from the data at startup, not stored in the config.

The dataclass field names ARE the schema — JSON keys are matched against
them and unknown keys are rejected loudly rather than silently dropped.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, Optional

from .models.dgn_net import DGNConfig
from .train.trainer import TrainParams


@dataclasses.dataclass
class DataParams:
    """Dataset options the reference passes as CLI-only flags."""
    data_dir: str = ""            # root holding ZINC.pkl / OGB csvs; "" -> synthetic
    cache_dir: str = ""           # eig cache location ("" -> no disk cache)
    pos_enc_dim: int = 0          # molecules --pos_enc_dim
    lap_norm: str = "none"        # --lap_norm: none|sym|walk
    coord_eig: bool = False       # superpixels --coord_eig
    proportion: float = 1.0       # superpixels train subset --proportion
    synthetic_size: int = 512     # graphs per split in synthetic fallback
    # execution layout of the packed batches (graph.pack_graphs):
    #   flat   — one flat COO edge list, XLA segment ops
    #   mxu    — block-diagonal 128-node packing; every hot gather/scatter is
    #            a one-hot MXU matmul (ops/mxu.py)
    #   auto   — mxu everywhere (single-device, DP, and EP)
    layout: str = "auto"
    # >1: size-bucketed batching (data/loader.py BucketedLoader) — K tight
    # bucket geometries / K compilations instead of 1 worst-case shape.
    # Single-device runs only; DP/EP keep one shape per shard.
    n_buckets: int = 1
    # pad-shape sizing for shuffled single-device loaders (data/loader.py):
    #   typical — sized for typical batches; a rare oversized batch repacks
    #             at the worst-case shape (identical results, one extra
    #             compile).  ~2x fewer padded edge slots on ZINC-shaped data.
    #   worst   — any-subset bound; every batch fits by construction.
    geometry: str = "typical"
    # >1: split each train batch into K micro-batches run inside ONE jitted
    # step with gradient accumulation (exact batch-mean loss semantics,
    # Trainer._micro_batched).  "auto" = ceil(batch_size/1024) — keeps the
    # packed step at the measured ~1024-graphs/chip sweet spot (BENCH_r04:
    # per-edge cost RISES with packed batch size).  Single-device runs only.
    micro_batches: Any = "auto"


@dataclasses.dataclass
class ExperimentConfig:
    model: str = "DGN"
    dataset: str = "ZINC"
    out_dir: str = "out"
    params: TrainParams = dataclasses.field(default_factory=TrainParams)
    net_params: DGNConfig = dataclasses.field(default_factory=DGNConfig)
    data: DataParams = dataclasses.field(default_factory=DataParams)

    @property
    def task(self) -> str:
        """Dataset name -> task key (trainer metric family + model factory)."""
        d = self.dataset.upper()
        if d in ("ZINC", "ZINC-FULL"):
            return "zinc"
        if d.startswith("SBM"):
            return "sbm"
        if d in ("MNIST", "CIFAR10"):
            return "superpixels"
        if d == "HIV":
            return "hiv"
        if d == "PCBA":
            return "pcba"
        if d == "COLLAB":
            return "collab"
        raise ValueError(f"unknown dataset {self.dataset!r}")


def _overlay_dataclass(obj, values: Dict[str, Any], where: str):
    """Replace dataclass fields from a dict; unknown keys are errors."""
    names = {f.name for f in dataclasses.fields(obj)}
    unknown = set(values) - names - IGNORED_KEYS
    if unknown:
        raise KeyError(f"unknown config keys in {where}: {sorted(unknown)}")
    usable = {k: v for k, v in values.items() if k in names}
    return dataclasses.replace(obj, **usable)


# reference net_params keys that have no direct field here
#  - layer_type: 'dgl' vs dense backend selector — this framework always runs
#    the flat segment path (the dense backend is a library API, dense/);
#  - divide_input_first/last are mapped onto divide_input (towers nets):
#    first applies to layers 0..L-2, last to the final layer.
IGNORED_KEYS = {"layer_type", "gpu"}


def _map_net_params(np_json: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(np_json)
    first = out.pop("divide_input_first", None)
    last = out.pop("divide_input_last", None)
    if first is not None:
        out["divide_input"] = bool(first)
    if last is not None:
        out["divide_input_last"] = bool(last)
    return out


def load_config(path: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None
                ) -> ExperimentConfig:
    """JSON file -> ExperimentConfig, then apply CLI-style overrides.

    overrides keys use the flat reference CLI namespace: trainer params and
    net params by name (they don't collide), plus 'dataset', 'out_dir' and
    DataParams fields.
    """
    cfg = ExperimentConfig()
    if path:
        with open(path) as f:
            raw = json.load(f)
        cfg = dataclasses.replace(
            cfg,
            model=raw.get("model", cfg.model),
            dataset=raw.get("dataset", cfg.dataset),
            out_dir=raw.get("out_dir", cfg.out_dir),
        )
        if "params" in raw:
            cfg = dataclasses.replace(cfg, params=_overlay_dataclass(
                cfg.params, raw["params"], "params"))
        if "net_params" in raw:
            cfg = dataclasses.replace(cfg, net_params=_overlay_dataclass(
                cfg.net_params, _map_net_params(raw["net_params"]),
                "net_params"))
        if "data" in raw:
            cfg = dataclasses.replace(cfg, data=_overlay_dataclass(
                cfg.data, raw["data"], "data"))
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg: ExperimentConfig,
                    overrides: Dict[str, Any]) -> ExperimentConfig:
    """Flat-namespace overrides; None values are skipped (absent CLI flags),
    mirroring `if args.x is not None` in the reference drivers."""
    overrides = {k: v for k, v in overrides.items() if v is not None}
    p_names = {f.name for f in dataclasses.fields(TrainParams)}
    n_names = {f.name for f in dataclasses.fields(DGNConfig)}
    d_names = {f.name for f in dataclasses.fields(DataParams)}
    top = {"model", "dataset", "out_dir"}
    mapped = _map_net_params(overrides)
    for k in mapped:
        if k not in p_names | n_names | d_names | top:
            raise KeyError(f"unknown override {k!r}")
    cfg = dataclasses.replace(
        cfg, **{k: v for k, v in mapped.items() if k in top})
    cfg = dataclasses.replace(cfg, params=dataclasses.replace(
        cfg.params, **{k: v for k, v in mapped.items() if k in p_names}))
    cfg = dataclasses.replace(cfg, net_params=dataclasses.replace(
        cfg.net_params, **{k: v for k, v in mapped.items() if k in n_names}))
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, **{k: v for k, v in mapped.items() if k in d_names}))
    return cfg


def build_argparser() -> argparse.ArgumentParser:
    """One parser covering the union of the five reference drivers' flags
    (main_molecules.py:164-203 et al.); every flag defaults to None =
    "don't override"."""
    ap = argparse.ArgumentParser(description="dgn_tpu experiment driver")
    ap.add_argument("--config", type=str, default=None,
                    help="JSON config (reference configs/*.json schema)")
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default=None)
    # trainer params
    for name, typ in [("seed", int), ("epochs", int), ("batch_size", int),
                      ("init_lr", float), ("lr_reduce_factor", float),
                      ("lr_schedule_patience", int), ("min_lr", float),
                      ("weight_decay", float), ("print_epoch_interval", int),
                      ("max_time", float), ("augmentation", float),
                      ("distortion", float)]:
        ap.add_argument(f"--{name}", type=typ, default=None)
    ap.add_argument("--flip", type=lambda s: s.lower() == "true", default=None)
    # net params
    for name, typ in [("L", int), ("hidden_dim", int), ("out_dim", int),
                      ("type_net", str), ("aggregators", str),
                      ("scalers", str), ("towers", int), ("edge_dim", int),
                      ("pretrans_layers", int), ("posttrans_layers", int),
                      ("in_feat_dropout", float), ("dropout", float),
                      ("readout", str), ("virtual_node", str)]:
        ap.add_argument(f"--{name}", type=typ, default=None)
    for name in ["residual", "edge_feat", "graph_norm", "batch_norm",
                 "divide_input_first", "divide_input_last", "decompose"]:
        ap.add_argument(f"--{name}", type=lambda s: s.lower() == "true",
                        default=None)
    # data params
    ap.add_argument("--data_dir", type=str, default=None)
    ap.add_argument("--cache_dir", type=str, default=None)
    ap.add_argument("--pos_enc_dim", type=int, default=None)
    ap.add_argument("--lap_norm", type=str, default=None)
    ap.add_argument("--coord_eig", type=lambda s: s.lower() == "true",
                    default=None)
    ap.add_argument("--proportion", type=float, default=None)
    ap.add_argument("--synthetic_size", type=int, default=None)
    ap.add_argument("--layout", type=str, default=None,
                    choices=["auto", "flat", "mxu"],
                    help="execution layout (DataParams.layout)")
    ap.add_argument("--compute_dtype", type=str, default=None,
                    help="matmul input dtype for MXU block ops, e.g. bfloat16")
    ap.add_argument("--geometry", type=str, default=None,
                    choices=["typical", "worst"],
                    help="pad-shape sizing for shuffled loaders "
                         "(DataParams.geometry)")
    ap.add_argument("--n_buckets", type=int, default=None,
                    help=">1: size-bucketed batching — K tight bucket shapes "
                         "(K compilations) instead of 1 worst-case shape")
    ap.add_argument("--micro_batches", type=str, default=None,
                    help="'auto' (default: ceil(batch/1024)), or an int K: "
                         "run each train batch as K micro-batches inside one "
                         "jitted step (gradient accumulation, exact "
                         "batch-mean loss)")
    # runtime
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="checkpoint dir (enables save + auto-resume)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--n_devices", type=int, default=None,
                    help="data-parallel shards (default: all visible)")
    ap.add_argument("--partition", type=str, default="dp",
                    choices=["dp", "ep"],
                    help="multi-device strategy: dp = batch sharding, "
                         "ep = edge-partitioned graphs w/ halo exchange")
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma-separated seed list, e.g. 41,42,43,44 — run "
                         "the full pipeline once per seed and report "
                         "mean±std in the reference's comparison-table "
                         "format (reference realworld_benchmark/"
                         "README.md:32)")
    ap.add_argument("--multihost", action="store_true",
                    help="join the multi-host JAX runtime "
                         "(jax.distributed.initialize) before building the "
                         "mesh; auto-detects on TPU pods")
    ap.add_argument("--coordinator_address", type=str, default=None,
                    help="multihost coordinator host:port (TPU pods "
                         "auto-detect)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    return ap


def config_from_args(argv=None) -> tuple:
    ap = build_argparser()
    args = ap.parse_args(argv)
    ov = {k: v for k, v in vars(args).items()
          if k not in ("config", "checkpoint", "resume", "n_devices",
                       "partition", "multihost", "coordinator_address",
                       "num_processes", "process_id", "seeds")}
    cfg = load_config(args.config, ov)
    return cfg, args

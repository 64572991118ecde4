"""Typed experiment configs (SURVEY C17, §5.6).

Dataclass-based configs serializable to/from JSON (run-dir provenance), with
CLI ``--a.b.c=value`` dot-path overrides — dependency-light (no hydra), typed
conversion driven by dataclass field annotations. One JSON file per driver
experiment lives in ``configs/`` [B:6-12].
"""

from __future__ import annotations

import dataclasses
import json
import typing
from typing import Any, Dict, List, Tuple, get_args, get_origin

from multinn_tpu.data.datasets import DataConfig
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.parallel.mesh import MeshConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 10
    lr: float = 1e-3
    lr_schedule: str = "constant"      # constant | cosine (to lr_min)
    lr_min: float = 0.0                # cosine floor
    warmup_steps: int = 0              # linear 0 -> lr over this many steps
    decay_steps: int = 0               # cosine horizon; 0 = epochs * ~steps
    optimizer: str = "adam"            # adam | sgd | hf (rnn-nade only —
    # Hessian-free truncated Newton, training/hf.py; the paper's
    # RNN-NADE-HF training regime)
    hf_cg_iters: int = 25              # CG iterations per HF macro-step
    hf_lambda0: float = 1.0            # initial LM damping
    grad_clip: float = 5.0             # global-norm clip; 0 disables
    weight_decay: float = 0.0
    seed: int = 42
    steps_per_call: int = 1            # optimizer steps fused into ONE device
    # program (lax.scan over stacked batches): amortizes per-dispatch host
    # overhead (~30 ms/exec on tunneled TPU vs ~2 ms device time per step)
    eval_every_epochs: int = 1
    log_every_steps: int = 50
    ckpt_every_steps: int = 500
    keep_last: int = 3
    keep_best: bool = True
    early_stop_patience: int = 0       # epochs without valid improvement; 0=off
    pretrain_encoder_epochs: int = 0   # greedy layer-wise DBN pretraining
    pretrain_lr: float = 1e-3
    fault_inject_step: int = -1        # §5.3 debug: raise at this step
    # TensorBoard pianoroll IMAGE summaries at eval time (SURVEY C19 — the
    # reference's image summaries): a free-running sample + (once) a
    # ground-truth validation window. Opt-in: the sample comes from a small
    # jitted generation program compiled on first use.
    image_summaries: bool = False
    run_dir: str = "runs/default"


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    n_steps: int = 1024                # 64 bars × 16 steps/bar [B:5]
    n_samples: int = 2
    seed_steps: int = 32
    gibbs_k: int = 0                   # 0 = use model cfg gen_k
    # sampling temperature (1.0 = the model distribution). Exact
    # decoder-param transform (multinn.tempered_params): RBM = inverse
    # temperature on the joint, NADE = per-conditional logit/T, DBN decode
    # conditional = logit/T. Static per compiled program (one program per
    # temperature value — serving picks it at service construction).
    temperature: float = 1.0
    bpm: float = 120.0
    out_dir: str = "samples"
    # opt-in frame-roll clean-up (pianoroll.postprocess_roll): close silent
    # gaps <= gap_fill_steps inside a note, then drop notes shorter than
    # min_note_steps. Generation knobs (MuseGAN-style post-processing);
    # applied to GENERATED rolls only, never the corpus side of eval
    gap_fill_steps: int = 0
    min_note_steps: int = 0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: MultINNConfig = dataclasses.field(default_factory=MultINNConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    generate: GenerateConfig = dataclasses.field(
        default_factory=GenerateConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def validate(self) -> "ExperimentConfig":
        if self.model.n_tracks != self.data.n_tracks:
            raise ValueError(
                f"model.n_tracks={self.model.n_tracks} != "
                f"data.n_tracks={self.data.n_tracks}")
        if self.model.n_pitches != self.data.frame_dim:
            hint = (" (data.encoding=onset_hold doubles the visible width: "
                    f"set model.n_pitches={self.data.frame_dim})"
                    if self.data.encoding != "frame" else "")
            raise ValueError(
                f"model.n_pitches={self.model.n_pitches} != data frame dim "
                f"{self.data.frame_dim}{hint}")
        if self.mesh.use_mesh and self.mesh.track > 1:
            if self.mesh.style != "gspmd":
                raise ValueError("track sharding requires mesh.style=gspmd")
            if self.model.mode == "joint":
                raise ValueError("joint mode has no track axis to shard")
            if self.model.n_tracks % self.mesh.track:
                raise ValueError(
                    f"n_tracks={self.model.n_tracks} not divisible by "
                    f"mesh.track={self.mesh.track}")
        if self.mesh.use_mesh and self.mesh.model > 1:
            if self.mesh.style != "gspmd":
                raise ValueError(
                    "tensor (model-axis) sharding requires mesh.style=gspmd")
            if self.model.n_hidden % self.mesh.model:
                raise ValueError(
                    f"n_hidden={self.model.n_hidden} not divisible by "
                    f"mesh.model={self.mesh.model}")
        if self.mesh.use_mesh and self.mesh.seq > 1:
            if self.mesh.style != "seqpipe":
                raise ValueError(
                    "time (seq-axis) sharding requires mesh.style=seqpipe")
            if self.data.window % self.mesh.seq:
                raise ValueError(
                    f"data.window={self.data.window} not divisible by "
                    f"mesh.seq={self.mesh.seq}")
        if self.mesh.style == "seqpipe" and self.mesh.seq <= 1:
            raise ValueError("mesh.style=seqpipe requires mesh.seq > 1")
        return self


# ---------------------------------------------------------------------------
# generic dataclass <-> dict/JSON with typed coercion
# ---------------------------------------------------------------------------

def _coerce(value: Any, typ: Any) -> Any:
    origin = get_origin(typ)
    if dataclasses.is_dataclass(typ) and isinstance(value, dict):
        return from_dict(typ, value)
    if origin in (tuple, Tuple) and isinstance(value, (list, tuple)):
        args = get_args(typ)
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in value)
        if args:
            return tuple(_coerce(v, t) for v, t in zip(value, args))
        return tuple(value)
    if origin in (list, List) and isinstance(value, (list, tuple)):
        (arg,) = get_args(typ) or (Any,)
        return [_coerce(v, arg) for v in value]
    if typ is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    if typ in (int, float) and isinstance(value, str):
        return typ(value)
    if typ is float and isinstance(value, int):
        return float(value)
    if origin is typing.Union:           # Optional[...]
        for arg in get_args(typ):
            if arg is type(None):
                if value is None or value == "none":
                    return None
                continue
            try:
                return _coerce(value, arg)
            except (TypeError, ValueError):
                continue
    return value


def from_dict(cls, d: Dict[str, Any]):
    """Build dataclass ``cls`` from a (possibly nested) plain dict, coercing
    scalar types per field annotations. Unknown keys are an error (catches
    config typos — §5.6)."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    hints = typing.get_type_hints(cls)
    unknown = set(d) - set(fields)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: "
                         f"{sorted(unknown)}")
    kwargs = {k: _coerce(v, hints[k]) for k, v in d.items()}
    return cls(**kwargs)


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _migrate(d: Dict[str, Any]) -> Dict[str, Any]:
    """Renamed-key migrations for configs written by older versions (keeps
    from_dict strict for typo catching while old run dirs stay loadable)."""
    train = d.get("train", {})
    if "remat" in train:                     # moved: train.remat -> model.remat
        d.setdefault("model", {})["remat"] = train.pop("remat")
    return d


def load_json(path: str) -> ExperimentConfig:
    with open(path) as f:
        return from_dict(ExperimentConfig, _migrate(json.load(f)))


def save_json(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)
        f.write("\n")


def load_run_config(run_dir, config_path, overrides):
    """Resolve an ExperimentConfig for the generate/evaluate CLIs: explicit
    --config wins, else <run_dir>/config.json; applies --a.b=c overrides and
    pins train.run_dir to the run dir. Raises FileNotFoundError if absent."""
    import os
    path = config_path or os.path.join(run_dir or "", "config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"config not found: {path}")
    cfg = load_json(path)
    ovs = list(overrides or [])
    if run_dir:
        ovs.insert(0, f"train.run_dir={run_dir}")
    if ovs:
        cfg = apply_overrides(cfg, ovs)
    return cfg.validate()


def apply_overrides(cfg: ExperimentConfig,
                    overrides: List[str]) -> ExperimentConfig:
    """Apply CLI ``a.b.c=value`` dot-path overrides (leading ``--`` allowed).
    Values are parsed as JSON when possible, else kept as strings, then
    coerced by field type."""
    d = to_dict(cfg)
    for ov in overrides:
        ov = ov.lstrip("-")
        if "=" not in ov:
            raise ValueError(f"override '{ov}' is not key=value")
        path, raw = ov.split("=", 1)
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = d
        keys = path.split(".")
        for k in keys[:-1]:
            if k not in node:
                raise ValueError(f"unknown config path '{path}'")
            node = node[k]
        if keys[-1] not in node:
            raise ValueError(f"unknown config path '{path}'")
        node[keys[-1]] = value
    return from_dict(ExperimentConfig, d)

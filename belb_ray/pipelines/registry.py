"""PipelineStep protocol + name registry (SURVEY §2.8).

The reference's extension surface is a name→(config, parser, module)
registry — ``AutoBelbCorpus`` / ``AutoBelbKb``
(/root/reference/belb/corpora/__init__.py:37-144,
/root/reference/belb/kbs/__init__.py:28-132) — plus abstract parser hooks
(corpora/parser.py:171-219). The Ray-native equivalent: a step is a
``Dataset → Dataset`` callable with a name, a frozen config dict and an
optionally-declared output schema; steps register under a unique name and
compose into pipelines; the step's (name, config) feed the checkpoint
config hash, so two runs of the same named step with the same config
resume from the same shards.

Usage::

    @register_step("normalize_text")
    def make_normalize(cfg):            # cfg dict → step callable
        def step(ds):
            ...
        return step

    step = build_step("normalize_text", {"col": "text"})
    out = run_step("normalize_text", {"col": "text"}, ds,
                   checkpoint_dir="/tmp/ck")   # checkpointed by step hash
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Protocol, runtime_checkable

import ray.data as rd


@runtime_checkable
class PipelineStep(Protocol):
    """A named Dataset→Dataset transform with a frozen config."""

    name: str
    config: dict[str, Any]

    def __call__(self, ds: rd.Dataset) -> rd.Dataset: ...


@dataclass
class FnStep:
    """Adapter: plain function + metadata → PipelineStep."""

    name: str
    config: dict[str, Any]
    fn: Callable[[rd.Dataset], rd.Dataset]
    output_schema: "Any | None" = None  # optional pyarrow.Schema declaration

    def __call__(self, ds: rd.Dataset) -> rd.Dataset:
        out = self.fn(ds)
        if self.output_schema is not None:
            declared = set(self.output_schema.names)
            actual = set(out.schema().names)
            if not declared.issubset(actual):
                raise ValueError(
                    f"step {self.name!r}: declared output columns "
                    f"{sorted(declared - actual)} missing from result "
                    f"schema {sorted(actual)}")
        return out


# name → factory(config dict) -> Dataset→Dataset callable (or FnStep)
_REGISTRY: dict[str, Callable[[dict], Callable[[rd.Dataset], rd.Dataset]]] = {}


def register_step(name: str):
    """Decorator registering a step factory under a unique name."""

    def _wrap(factory):
        if name in _REGISTRY:
            raise ValueError(f"step name already registered: {name!r}")
        _REGISTRY[name] = factory
        return factory

    return _wrap


def unregister_step(name: str) -> None:
    _REGISTRY.pop(name, None)


def list_steps() -> list[str]:
    return sorted(_REGISTRY)


def build_step(name: str, config: dict[str, Any] | None = None) -> FnStep:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown step {name!r}; registered: {list_steps()}")
    config = dict(config or {})
    fn = _REGISTRY[name](config)
    schema = getattr(fn, "output_schema", None)
    return FnStep(name=name, config=config, fn=fn, output_schema=schema)


def run_step(name: str, config: dict[str, Any] | None, ds: rd.Dataset,
             checkpoint_dir: str | None = None,
             lineage: dict | None = None) -> rd.Dataset:
    """Build + run a registered step; with ``checkpoint_dir`` the result
    is checkpointed under a hash of (step name, config) — the reference's
    config-hexdigest output versioning (SURVEY §1.3)."""
    step = build_step(name, config)
    if checkpoint_dir is None:
        return step(ds)
    from .checkpoint import checkpoint_stage

    return checkpoint_stage(
        lambda: step(ds), f"{checkpoint_dir}/{name}",
        {"step": name, **step.config},
        lineage={"step": name, **(lineage or {})})


# ---- built-in steps ------------------------------------------------------


@register_step("ensure_identity")
def _make_ensure_identity(cfg: dict):
    from ..stages.dedup import ensure_identity_columns

    def step(ds: rd.Dataset) -> rd.Dataset:
        return ensure_identity_columns(
            ds, id_cols=tuple(cfg.get("id_cols", ("repo", "path", "commit"))),
            content_col=cfg.get("content_col", "content"))

    return step


@register_step("normalize_text")
def _make_normalize(cfg: dict):
    import pyarrow as pa

    from ..functions.text import normalize_text_array

    def step(ds: rd.Dataset) -> rd.Dataset:
        c = cfg.get("col", "text")

        def _f(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.column_names.index(c), c,
                normalize_text_array(batch[c].combine_chunks()))

        return ds.map_batches(_f, batch_format="pyarrow")

    return step


@register_step("exact_dedup")
def _make_exact_dedup(cfg: dict):
    from ..stages.dedup import exact_dedup_annotate

    def step(ds: rd.Dataset) -> rd.Dataset:
        return exact_dedup_annotate(
            ds, hash_col=cfg.get("hash_col", "content_sha256"),
            id_col=cfg.get("id_col", "row_id"),
            num_buckets=int(cfg.get("num_buckets", 64)))

    return step


@register_step("minhash_features")
def _make_minhash_features(cfg: dict):
    from ..stages.blocking import compute_features

    def step(ds: rd.Dataset) -> rd.Dataset:
        return compute_features(
            ds, num_perm=int(cfg.get("num_perm", 128)),
            shingle_k=int(cfg.get("shingle_k", 3)),
            seed=int(cfg.get("seed", 7)),
            batch_size=int(cfg.get("batch_size", 2048)),
            keep_cols=tuple(cfg.get("keep_cols", ())))

    return step


def run_pipeline(
    steps: list[tuple[str, dict[str, Any] | None]],
    ds: rd.Dataset,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Compose registered steps sequentially — the named-pipeline analog
    of the reference's corpus build chain (fetch → parse → normalize →
    dedup, corpora/parser.py pipeline hooks). Each step's checkpoint
    hash chains the UPSTREAM hashes, so editing any step's config (or
    reordering) invalidates exactly the downstream checkpoints and a
    re-run resumes from the last unchanged stage — the lineage
    semantics of the reference's config-hexdigest versioning extended
    to a DAG path. Steps run under ``<checkpoint_dir>/<idx>-<name>``
    (the index keeps repeated step names distinct)."""
    from .checkpoint import config_hash

    upstream = ""
    out = ds
    for i, (name, config) in enumerate(steps):
        step = build_step(name, config)
        chained = {"step": name, "__upstream": upstream, **step.config}
        upstream = config_hash(chained)
        if checkpoint_dir is None:
            out = step(out)
            continue
        from .checkpoint import checkpoint_stage

        bound = out  # bind loop variable for the factory closure
        out = checkpoint_stage(
            lambda b=bound, s=step: s(b),
            f"{checkpoint_dir}/{i:02d}-{name}", chained,
            lineage={"step": name, "position": i,
                     "upstream_hash": chained["__upstream"]})
    return out

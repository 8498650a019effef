"""Batched model inference over a document corpus (SURVEY §2 #85).

The missing tier between the heuristic quality gates (text.py /
curation.py) and a production curation stack: model-BASED scoring —
perplexity / quality-classifier filtering (CCNet's KenLM stage,
RedPajama-v2's classifier signals) and embedding generation feeding the
ANN/SemDeDup tiers (similarity.py).

No model runtime ships in this container, so — exactly like
``multimodal.decode_image`` — the MODEL is swappable and the SPARK
PLUMBING is real and tested:

- ``mapInPandas`` over Arrow record batches: the model sees a BATCH of
  documents per call (the shape GPU/ONNX inference needs), never a row
  at a time. The output carries ``batch_rows`` — the actual batch size
  the model saw — so vectorized invocation is asserted, not assumed.
- model lifecycle: the model handle loads ONCE PER PARTITION-TASK
  (inside the iterator function, before the batch loop), not per batch
  — the standard Spark pattern for heavyweight model state. With
  ``spark.python.worker.reuse`` (default on) the process-level cache
  below makes it once per EXECUTOR.
- batch sizing is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k) —
  size it to the model's optimal batch × sequence length, and size
  partitions (``maxPartitionBytes`` / explicit repartition) so a task
  holds many batches.
- the default model is a clearly-labeled deterministic fake (md5-seeded
  — engine-portable, so tests and the oracle can replay it); plugging
  a real scorer in is one constructor swap with zero plan changes.

At 100 TB this stage is compute-bound and embarrassingly parallel:
zero shuffles, scales with executors; co-schedule with GPU resource
profiles where available.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


class FakeScoringModel:
    """Deterministic stand-in for a quality/perplexity scorer.

    Scores are a pure function of the text's md5 (uniform in [0, 1))
    plus a length-normalized token-repetition penalty — shaped like a
    real quality signal, reproducible everywhere (hashlib only).
    ``name`` is stamped into the output so downstream consumers can
    never mistake fake scores for a real model's.
    """

    name = "fake-md5-scorer"

    def load(self) -> "FakeScoringModel":  # real models: load weights here
        return self

    def score_batch(self, texts: pd.Series) -> pd.Series:
        import hashlib

        def one(t: str) -> float:
            h = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            base = h / 2**64
            toks = t.split()
            distinct_ratio = len(set(toks)) / len(toks) if toks else 0.0
            return round(0.5 * base + 0.5 * distinct_ratio, 6)

        # na_action="ignore": NULL text scores NULL — matching the SQL
        # oracle, where md5(NULL) is NULL (a crash on None here would
        # fail the whole task on one bad upstream row)
        return texts.map(one, na_action="ignore")


class FakeEmbeddingModel:
    """Deterministic stand-in for an embedding model: ``dim`` doubles
    in [-1, 1), md5-derived per (text, position) — stable, uniform,
    engine-portable."""

    name = "fake-md5-embedder"

    def __init__(self, dim: int = 16) -> None:
        self.dim = dim

    def load(self) -> "FakeEmbeddingModel":
        return self

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        import hashlib

        def one(t: str) -> list[float]:
            out = []
            for i in range(self.dim):
                h = int.from_bytes(
                    hashlib.md5(f"{i}:{t}".encode("utf-8")).digest()[:8],
                    "big",
                )
                out.append(round(h / 2**63 - 1.0, 6))
            return out

        return texts.map(one, na_action="ignore")  # NULL text → NULL vector


# one model handle per python worker PROCESS (worker reuse makes this
# once per executor, amortized over every task it runs)
_MODEL_CACHE: dict[tuple[str, str, str], object] = {}


def clear_model_cache() -> None:
    """Drop every cached model handle in THIS process (on an executor:
    call from a task, e.g. ``sc.range(n).foreachPartition``). The
    invalidation hook for factories that can't carry a ``cache_key``."""
    _MODEL_CACHE.clear()


def _cached_load(model_factory: Callable[[], object]) -> object:
    """Cache by the factory's (module, qualname) — a stable identity
    across task deserializations. repr()/id()-based keys would mint a
    fresh key per deserialized closure (cache never hits, dead models
    accumulate) and can even collide after GC address reuse. Factories
    WITHOUT a stable name (lambdas, functools.partial, local closures)
    are loaded per task, uncached — correct, just without the
    once-per-executor amortization; use a module-level class or
    function to get it.

    (module, qualname) alone has NO invalidation: with python-worker
    reuse, two jobs whose same-named factory behaves differently (a
    reconfigured module global, a reloaded class, baked-in constructor
    args) would share one stale instance per executor (advice r3).  A
    factory (or its loaded model) can therefore declare a
    ``cache_key`` attribute — a version/config string mixed into the
    key; bump it when the factory's behavior changes.  Call
    :func:`clear_model_cache` to drop every cached handle in this
    worker."""
    mod = getattr(model_factory, "__module__", None)
    qual = getattr(model_factory, "__qualname__", None)
    if not mod or not qual or "<lambda>" in qual or "<locals>" in qual:
        return model_factory().load()  # type: ignore[attr-defined]
    key = (mod, qual, str(getattr(model_factory, "cache_key", "")))
    m = _MODEL_CACHE.get(key)
    if m is None:
        m = model_factory().load()  # type: ignore[attr-defined]
        _MODEL_CACHE[key] = m
    return m


def score_documents(
    df: DataFrame,
    model_factory: Callable[[], object] = FakeScoringModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based document scoring: (id, score, model, batch_rows).

    ``batch_rows`` is the size of the Arrow batch the model actually
    saw — the proof of vectorized invocation (a per-row fallback would
    show 1s). Filter on ``score`` downstream exactly like the Gopher
    gates; the plan stays one mapInPandas projection, zero shuffles.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _cached_load(model_factory)  # once per task, not per batch
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "score": model.score_batch(pdf[text_col]).astype("float64"),
                    "model": model.name,
                    "batch_rows": len(pdf),
                }
            )

    return df.mapInPandas(
        run, "doc_id bigint, score double, model string, batch_rows int"
    )


def embed_documents(
    df: DataFrame,
    model_factory: Callable[[], object] = FakeEmbeddingModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Embedding generation: (id, embedding array<double>, model).

    The output column is exactly the shape ``similarity.py`` consumes
    (knn/SemDeDup/quantization), so a real embedder closes the
    text → embedding → dedup/ANN loop with no further changes.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _cached_load(model_factory)
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "embedding": model.embed_batch(pdf[text_col]),
                    "model": model.name,
                }
            )

    return df.mapInPandas(
        run, "doc_id bigint, embedding array<double>, model string"
    )

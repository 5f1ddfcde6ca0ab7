"""Reusable durability harness for foreachBatch streaming components
(O3/O6): the versioned-snapshot discipline the incremental resolver
pioneered (`streaming/resolution.py:51-140` — per-batch commit marker,
rollback-on-replay, O(batch) delta persistence with periodic compaction),
factored so every stateful component (anomaly detector, recommender,
incremental dedup) gets crash-restart exactly-once semantics from ONE
audited implementation instead of three hand-rolled copies.

A component declares its tables once:

- **fulls** — bounded working sets (per-user ring buffers, running-sum
  registers): rewritten whole each batch; size tracks the KEY space, not
  stream history.
- **deltas** — append-only outputs (flagged anomalies, emitted
  recommendations, resolved mappings): each batch persists only its own
  additions; a full compaction rides along every ``COMPACT_EVERY``
  batches (and always on the first commit, so a recovery base exists).
  Recovery reads newest-compaction + later committed deltas.

Crash model (same as the resolver, `tests/test_incremental_resolution.py::
test_resolver_restart_recovers_state_exactly_once`): if the process dies
AFTER a batch's state commit but BEFORE the engine commits its offsets,
the engine replays that batch on restart; ``begin_batch`` detects the
replayed batch_id and rolls the state back one version first, so
reprocessing is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .resolution import COMPACT_EVERY, _StateStore, flat_checkpoint

__all__ = ["COMPACT_EVERY", "DurableTables", "flat_checkpoint"]


class DurableTables:
    """Versioned state for one streaming component.

    ``fulls`` / ``deltas`` map table name → DDL schema string. Without a
    ``state_dir`` every call degrades to the in-memory no-op (empty loads,
    commits skipped) so components run identically in throwaway mode.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str | None,
        fulls: dict[str, str],
        deltas: dict[str, str],
    ):
        self.spark = spark
        self.fulls = dict(fulls)
        self.deltas = dict(deltas)
        self.store = _StateStore(spark, state_dir) if state_dir else None
        self.committed_batch: int | None = (
            self.store.latest() if self.store else None
        )

    def _load_at(self, version: int | None) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for t, schema in self.fulls.items():
            out[t] = (
                self.store.load(version, t, schema)
                if self.store
                else self.spark.createDataFrame([], schema)
            )
        for t, schema in self.deltas.items():
            out[t] = (
                self.store.load_chain(version, t, schema)
                if self.store
                else self.spark.createDataFrame([], schema)
            )
        return out

    def load_latest(self) -> dict[str, DataFrame]:
        """All tables at the newest committed snapshot (empty frames when
        nothing is committed / no state_dir)."""
        return self._load_at(self.committed_batch)

    def begin_batch(self, batch_id: int) -> dict[str, DataFrame] | None:
        """Call at the top of every foreachBatch. On a replayed batch_id
        (crash between state commit and engine offset commit) the state
        rolls back one version; returns the reloaded tables for the
        component to re-adopt, else None."""
        if self.store is None or self.committed_batch is None:
            return None
        if batch_id > self.committed_batch:
            return None
        prior = batch_id - 1
        tables = self._load_at(prior if prior >= 0 else None)
        self.committed_batch = prior if prior >= 0 else None
        return tables

    def commit(
        self,
        batch_id: int,
        fulls: dict[str, DataFrame],
        deltas: dict[str, DataFrame],
        compacted: dict[str, DataFrame],
    ) -> None:
        """Persist this batch's snapshot: every declared full table, each
        append-only table's DELTA, plus — every ``COMPACT_EVERY`` batches
        (and always on the first commit, so a recovery base exists) — a
        compaction. ``compacted`` supplies each append-only table's full
        reconstructed content; pass the component's in-memory lazy union —
        it is only EXECUTED on compaction batches, so the amortized write
        stays O(batch). No-op without a state_dir."""
        if self.store is None:
            return
        missing = (
            (set(self.fulls) - set(fulls))
            | (set(self.deltas) - set(deltas))
            | (set(self.deltas) - set(compacted))
        )
        if missing:
            raise ValueError(f"commit missing declared tables: {sorted(missing)}")
        comp = {
            t: compacted[t]
            for t in self.deltas
            if batch_id % COMPACT_EVERY == 0
            or not self.store._bases(t, batch_id - 1)
        }
        self.store.save(batch_id, fulls, deltas=deltas, compactions=comp or None)
        self.committed_batch = batch_id

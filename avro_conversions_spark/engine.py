"""ValidationEngine: compile a constraint set against an observed schema,
run it over a DataFrame, emit (verdicts, violations).

Execution shape (designed for 100 TB / 1000 executors; see SURVEY.md §3.3):

1. plan-time: every constraint's ``check_plan`` runs on the driver against
   the observed schema — incompatibilities fail fast with ResolvingFailure,
   exactly like the reference's resolver compile
   (opwvhk/avro/io/AsAvroParserBase.java:369-398).
2. row pass: ALL row constraints evaluate in ONE columnar scan — each row
   projects an array of violation structs, filtered and exploded. Catalyst
   prunes the scan to exactly the constrained + key columns and fuses the
   predicates into one WholeStageCodegen span. N constraints != N scans.
3. aggregate passes: uniqueness (salted two-phase agg), referential
   (broadcast/sort-merge anti join), sequence (per-conversation window) each
   contribute violation rows; their shuffles are keyed independently so AQE
   can size each exchange.
4. verdicts: violation counts come from the (small) violations output;
   rows_checked comes from a column-pruned count over only the partition
   key — a metadata-cheap second scan, not a second full read.

Output schemas are frozen in FIXTURES.md §5; violation ordering is
canonical ``ORDER BY key..., constraint`` and observed values use a frozen
formatting spec (timestamps: ISO-8601 with 6-digit micros + offset,
decimals: plain string) so golden fixtures byte-match (BASELINE.json:15).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from avro_conversions_spark.constraints.core import RowConstraint
from avro_conversions_spark.constraints.referential import ReferentialConstraint
from avro_conversions_spark.constraints.sequence import SequenceConstraint
from avro_conversions_spark.constraints.uniqueness import UniqueConstraint

TS_CANON_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

# internal column name for the carried partition key (stripped from outputs)
_PART = "_acs_part"


def canonical_str(col: Column, dtype: T.DataType) -> Column:
    """Frozen formatting spec for the ``observed`` field (byte-match
    requirement)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, TS_CANON_FMT)
    return col.cast("string")


@dataclass
class ValidationResult:
    verdicts: DataFrame
    violations: DataFrame
    # handle on the persisted internal violations frame (if caching was
    # requested) so callers (e.g. the resumable ledger loop) can unpersist
    # after materializing outputs.
    cached: DataFrame | None = None
    # handle on the persisted pruned input projection (cache_input=True)
    cached_input: DataFrame | None = None

    def unpersist(self) -> None:
        if self.cached is not None:
            self.cached.unpersist()
        if self.cached_input is not None:
            self.cached_input.unpersist()


@dataclass
class ValidationEngine:
    row_constraints: Sequence[RowConstraint] = ()
    unique_constraints: Sequence[UniqueConstraint] = ()
    referential_constraints: Sequence[ReferentialConstraint] = ()
    sequence_constraints: Sequence[SequenceConstraint] = ()
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    partition_expr: Column | None = None  # verdict granularity; default global

    # ------------------------------------------------------------------ plan

    def check_plan(self, schema: T.StructType) -> None:
        for c in self.row_constraints:
            c.check_plan(schema)
        for cols in [u.columns for u in self.unique_constraints]:
            for col in cols:
                if col not in schema.fieldNames():
                    from avro_conversions_spark.schema.resolution import ResolvingFailure

                    raise ResolvingFailure(f"unique key column {col!r} absent")

    # ------------------------------------------------------------- row pass

    def _row_violations(self, df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
        if not self.row_constraints:
            return None  # type: ignore[return-value]
        schema = df.schema
        structs = []
        for c in self.row_constraints:
            dtype = schema[c.column].dataType
            structs.append(
                F.when(
                    c.violation(),
                    F.struct(
                        F.lit(c.name).alias("constraint"),
                        F.lit(c.column).alias("column"),
                        F.lit(c.reason).alias("reason"),
                        canonical_str(F.col(c.column), dtype).alias("observed"),
                    ),
                )
            )
        arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
        sel = [*self.key_cols, *extra_cols]
        return (
            df.select(*sel, arr.alias("_v"))
            .where(F.size("_v") > 0)
            .select(*sel, F.explode("_v").alias("_e"))
            .select(*sel, "_e.*")
        )

    # ------------------------------------------------------------ agg passes

    def _agg_violations(self, df: DataFrame, part_col: str | None = None) -> list[DataFrame]:
        out: list[DataFrame] = []
        key_cols = list(self.key_cols)
        extra = [part_col] if part_col else []
        for u in self.unique_constraints:
            # partition attribution rides the existing two-phase aggregation
            # (min(partition) per duplicated key) — no extra join, no extra
            # scan; deterministic "first partition lexicographically".
            v = u.violations(df, part_col=part_col)
            # uniqueness violations key on the duplicated key itself; pad any
            # missing engine key columns with nulls for a uniform schema
            missing = [k for k in key_cols if k not in v.columns]
            for m in missing:
                v = v.withColumn(m, F.lit(None).cast(df.schema[m].dataType))
            out.append(
                v.select(*key_cols, *extra, "constraint", "column", "reason", "observed")
            )
        for r in self.referential_constraints:
            # part_col is a plain column on df, so the violation projection
            # carries it through the anti-join for free
            out.append(r.violation_rows(df, key_cols + extra))
        for s in self.sequence_constraints:
            v = s.violations(df, extra_cols=tuple(extra))
            rename = {s.conv_col: key_cols[0], s.idx_col: key_cols[1]}
            for old, new in rename.items():
                if old != new:
                    v = v.withColumnRenamed(old, new)
            out.append(
                v.select(*key_cols, *extra, "constraint", "column", "reason", "observed")
            )
        return out

    # ------------------------------------------------------------------ run

    def violations_df(self, df: DataFrame, _part_col: str | None = None) -> DataFrame:
        parts: list[DataFrame] = []
        rv = self._row_violations(df, extra_cols=(_part_col,) if _part_col else ())
        if rv is not None:
            parts.append(rv)
        parts.extend(self._agg_violations(df, part_col=_part_col))
        if not parts:
            raise ValueError("no constraints configured")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _needed_columns(self, df: DataFrame) -> list[str]:
        need = set(self.key_cols)
        need.update(c.column for c in self.row_constraints)
        for u in self.unique_constraints:
            need.update(u.columns)
        need.update(r.column for r in self.referential_constraints)
        for s in self.sequence_constraints:
            need.add(s.conv_col)
            need.add(s.idx_col)
            if s.ts_col:
                need.add(s.ts_col)
        return [c for c in df.columns if c in need]

    def run(
        self,
        df: DataFrame,
        run_id: str = "run-0",
        cache_violations: bool = True,
        cache_input: bool | None = None,
    ) -> ValidationResult:
        self.check_plan(df.schema)
        if cache_input is None:
            # default resolves from the session-wide remote_storage flag:
            # see the cache_input comment below for the measured tradeoff
            from avro_conversions_spark.session import remote_storage

            cache_input = remote_storage(df.sparkSession)
        part_expr = (
            self.partition_expr if self.partition_expr is not None else F.lit("global")
        ).cast("string")
        # carry partition_key THROUGH every constraint pass (free: same scan,
        # one extra small column) instead of joining violations back to a
        # full-table dropDuplicates — at 100 TB that join was an extra
        # whole-table exchange just to map violation -> partition.
        pdf = df.withColumn(_PART, part_expr)
        cached_input = None
        if cache_input:
            # the constraint families (row pass, uniqueness, referential,
            # sequence, rows_checked) are independent consumers — each one
            # re-decodes the source (5 scans of the pruned columns; measured
            # plan). cache_input persists the PRUNED projection (constrained
            # + key columns only; a transcript table's text/payload never
            # enters) so the source is read ONCE. Measured on a LOCAL 42M-turn
            # parquet table this LOSES ~2x: vectorized re-decode out of the OS
            # page cache is cheaper than building + reading a deserialized
            # columnar cache, so the default is off. Turn it on when the
            # source is remote object storage (S3/GCS) or a cold Iceberg
            # snapshot, where each extra scan is real network I/O — there the
            # one-pass read dominates the cache-build cost.
            pdf = pdf.select(*self._needed_columns(df), _PART).persist()
            cached_input = pdf

        vint = self.violations_df(pdf, _part_col=_PART)
        if cache_violations:
            # persist BEFORE the canonical orderBy: a global sort's range
            # partitioner SAMPLES its child, so an uncached child plan (every
            # constraint pass over the full table) would execute twice —
            # once for sampling, once for the sort. Cached, both read the
            # small violation set. Also lets the verdict aggregation below
            # reuse it (at 100 TB: one full scan, not three).
            vint = vint.persist()
        violations = vint.select(
            F.lit(run_id).alias("run_id"),
            *self.key_cols,
            "constraint",
            "column",
            "reason",
            "observed",
        ).orderBy(*self.key_cols, "constraint")

        all_names = (
            [c.name for c in self.row_constraints]
            + [u.name for u in self.unique_constraints]
            + [r.name for r in self.referential_constraints]
            + [s.name for s in self.sequence_constraints]
        )
        names_df = df.sparkSession.createDataFrame(
            [(n,) for n in all_names], "constraint string"
        )

        # rows_checked: column-pruned scan over just the partition expression
        rows_checked = (
            pdf.select(F.col(_PART).alias("partition_key"))
            .groupBy("partition_key")
            .agg(F.count(F.lit(1)).alias("rows_checked"))
        )
        # violation counts straight from the carried partition column; rows
        # whose pass couldn't attribute a partition (e.g. null-keyed) land in
        # a dedicated bucket instead of being silently dropped
        vio_counts = vint.groupBy(
            F.coalesce(F.col(_PART), F.lit("unattributed")).alias("partition_key"),
            "constraint",
        ).agg(F.count(F.lit(1)).alias("violation_count"))

        # FULL outer join: a nonzero violation_count must surface even when
        # its partition_key matches no rows_checked partition (the silent
        # false-pass bug this replaces)
        verdicts = (
            rows_checked.crossJoin(names_df)
            .join(vio_counts, ["partition_key", "constraint"], "full")
            .select(
                F.lit(run_id).alias("run_id"),
                "partition_key",
                "constraint",
                F.when(F.coalesce("violation_count", F.lit(0)) > 0, F.lit("fail"))
                .otherwise(F.lit("pass"))
                .alias("status"),
                F.coalesce("violation_count", F.lit(0)).alias("violation_count"),
                F.coalesce("rows_checked", F.lit(0)).alias("rows_checked"),
                F.create_map(
                    F.lit("engine"), F.lit("avro_conversions_spark"),
                ).alias("metrics"),
            )
            .orderBy("partition_key", "constraint")
        )
        return ValidationResult(
            verdicts=verdicts,
            violations=violations,
            cached=vint if cache_violations else None,
            cached_input=cached_input,
        )

    # ------------------------------------------------------------- repairs

    def repaired(self, df: DataFrame) -> DataFrame:
        """Apply every constraint's repair (e.g. enum default substitution,
        io/AsAvroParserBase.java:443) returning the cleaned DataFrame."""
        out = df
        for c in self.row_constraints:
            if c.repair is not None:
                out = out.withColumn(c.column, c.repair(F.col(c.column)))
        return out

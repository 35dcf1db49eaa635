"""Streaming validation (engine extension — the reference is strictly
request/response and the north_rule requires only batch+resume; this is
the Structured-Streaming face of the same compiled rule set).

Because the rule compiler emits pure Column expressions, the identical
compiled plan applies to a streaming DataFrame unchanged: micro-batches
get per-row verdicts and violation rows with exactly the batch semantics.
Stateful extras (windowed violation-rate alerts) use watermarked windows.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import compile_ruleset
from ..dsl import BaseSchema, ObjectSchema
from ..engine import validate


def validate_stream(stream_df: DataFrame,
                    schema: Union[ObjectSchema, Dict[str, BaseSchema]],
                    id_cols: Optional[List[str]] = None,
                    ts_col: Optional[str] = None,
                    watermark: str = "10 minutes",
                    window: str = "1 minute",
                    schema_contract: Optional[Dict[str, str]] = None
                    ) -> Dict[str, DataFrame]:
    """Validate a streaming frame with the SAME engine face as batch:

    * ``annotated`` — input rows + ``_pass`` + ``_violations`` +
      ``_first_violation`` (append mode; identical to
      ``ValidationResult.annotated`` — one derivation, two faces)
    * ``violations`` — exploded violation rows (append mode)
    * ``rates`` — watermarked windowed pass/fail counts per rule window
      (update/append with watermark), when ``ts_col`` is given

    Each is an unstarted streaming DataFrame: attach ``.writeStream`` with
    the sink of your choice. The compiler emits pure Column expressions,
    so ``engine.validate`` applies to a streaming DataFrame unchanged —
    this module adds only the streaming-specific ``rates`` output rather
    than re-deriving (and drifting from) the batch outputs.

    ``schema_contract``: optional physical-schema preflight
    (operators/schema.py). A streaming source whose schema drifted fails
    HERE — before a query that would otherwise run 24/7 silently
    mis-typing — with every break listed; metadata-only, works on
    streaming frames (``df.schema`` needs no data).
    """
    if schema_contract:
        from ..operators.schema import assert_schema_contract
        assert_schema_contract(stream_df, schema_contract)
    res = validate(stream_df, schema, id_cols=id_cols)

    out = {"annotated": res.annotated, "violations": res.violations}
    if ts_col:
        out["rates"] = _windowed_rates(
            res.prepared.withColumn("_pass", res.compiled.row_pass),
            ts_col, watermark, window, F.col("_pass"), "rows")
    return out


def _windowed_rates(df: DataFrame, ts_col: str, watermark: str,
                    window: str, ok_col, count_alias: str) -> DataFrame:
    """One derivation of the watermarked windowed pass/fail rates shared
    by the rule face (validate_stream) and the audio face (decode_stream)
    — the two analogs must not drift."""
    return (df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window))
            .agg(F.count(F.lit(1)).alias(count_alias),
                 F.sum((~ok_col).cast("long")).alias("failed"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    count_alias, "failed"))


def decode_stream(stream_df: DataFrame,
                  check_reference: bool = True,
                  snr_threshold=30.0,
                  dur_tolerance_ms: int = 2,
                  ts_col: Optional[str] = None,
                  watermark: str = "10 minutes",
                  window: str = "1 minute") -> Dict[str, DataFrame]:
    """Codec-aware audio decode-and-check over a STREAMING clips frame —
    validate payloads as they land, with the SAME Arrow kernel as batch
    (``audio.decode.decode_check`` is ``mapInPandas``, which Structured
    Streaming executes per micro-batch unchanged: G.711/PCM LUT decode,
    batch-stacked ADPCM, per-codec SNR gates, one-violation-per-defect).

    * ``results`` — one DECODE_RESULT_SCHEMA row per clip (append mode)
    * ``violations`` — jio-shaped violation rows (append mode)
    * ``rates`` — watermarked windowed decoded/failed counts, when
      ``ts_col`` is given (the audio analog of validate_stream's rates)

    No salting here: a micro-batch is already small and the salted
    repartition would add a shuffle per micro-batch; skew across a long
    stream amortizes through micro-batch boundaries instead."""
    from ..audio.decode import (Mapping as _Mapping, decode_check,
                                decode_violations)
    passthrough = []
    if ts_col:
        passthrough.append(ts_col)
    if isinstance(snr_threshold, _Mapping):
        passthrough.append("codec")
    dec = decode_check(stream_df, check_reference=check_reference,
                       snr_threshold=snr_threshold,
                       dur_tolerance_ms=dur_tolerance_ms,
                       salt=False, passthrough=passthrough)
    all_ok = (F.col("decode_ok") & F.col("codec_match") & F.col("sr_match")
              & F.col("dur_match") & F.col("snr_ok")
              & F.col("transcript_match"))
    out = {"results": dec,
           "violations": decode_violations(
               dec, snr_threshold=snr_threshold)}
    if ts_col:
        out["rates"] = _windowed_rates(dec, ts_col, watermark, window,
                                       all_ok, "clips")
    return out


def stateful_violation_counts(stream_df: DataFrame,
                              schema: Union[ObjectSchema,
                                            Dict[str, BaseSchema]],
                              key_col: str) -> DataFrame:
    """Cumulative per-key rows/failed counts across micro-batches — the
    custom stateful-operator pattern (``applyInPandasWithState``) on top
    of the same compiled rule set. Each update-mode output row carries
    the running totals for its key; state is two longs per key.

    Use when the aggregate must span the whole stream lifetime (per
    source/speaker violation ledger) — watermarked windows in
    :func:`validate_stream` cover the bounded-lateness case."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    compiled = compile_ruleset(stream_df, schema)
    prepared = compiled.prepare(stream_df)
    flagged = (prepared
               .withColumn("_fail", (~compiled.row_pass).cast("long"))
               .select(key_col, "_fail"))
    key_type = stream_df.schema[key_col].dataType.simpleString()

    def update(key, pdfs, state):
        import pandas as pd
        failed, rows = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            failed += int(pdf["_fail"].sum())
            rows += len(pdf)
        state.update((failed, rows))
        yield pd.DataFrame({"key": [key[0]], "failed": [failed],
                            "rows": [rows]})

    return flagged.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"key {key_type}, failed long, rows long",
        stateStructType="failed long, rows long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)

"""Custom stateful streaming operator: per-conversation extraction progress.

The reference tracks per-document progress/failures as side files
(failures.jsonl + resume index, reference main.py:304-311); as a *stream*
over transcript turns this becomes keyed running state: for every
conversation, cumulative turns seen, extraction failures, max turn_idx,
and extracted bytes — maintained with ``applyInPandasWithState`` (the
Spark home for custom stateful operators, SURVEY.md §2.10).

State survives across AvailableNow runs through the state store in the
streaming checkpoint, so a killed stream resumes with its counts intact —
the stateful twin of the batch lineage table."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mistral_ocr_pipeline_spark.extractors.dispatch import extract_turn

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, n_errors long, max_turn_idx int, text_bytes long"
)
STATE_SCHEMA = "n_turns long, n_errors long, max_turn_idx int, text_bytes long"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_errors, max_idx, text_bytes = state.get
    else:
        n_turns, n_errors, max_idx, text_bytes = 0, 0, -1, 0
    for pdf in pdfs:
        texts = [t if isinstance(t, str) else None for t in pdf["text"]]
        tools = [t if isinstance(t, str) else None for t in pdf["tool"]]
        for t, tl, idx in zip(texts, tools, pdf["turn_idx"]):
            rec = extract_turn(t, tl)
            n_turns += 1
            if rec["error"] is not None:
                n_errors += 1
            elif rec["extracted_text"]:
                text_bytes += len(rec["extracted_text"].encode("utf-8"))
            # a null turn_idx arrives as NaN (pandas float column) —
            # int(NaN) raises and a single poison row would kill the
            # whole streaming query; treat it as "no index evidence"
            if idx == idx and idx is not None:
                max_idx = max(max_idx, int(idx))
    state.update((n_turns, n_errors, max_idx, text_bytes))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": n_turns,
                "n_errors": n_errors,
                "max_turn_idx": max_idx,
                "text_bytes": text_bytes,
            }
        ]
    )


def conversation_progress(stream_df: DataFrame) -> DataFrame:
    """Streaming transform: transcripts stream → one updated progress row
    per conversation per micro-batch (output mode: update)."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

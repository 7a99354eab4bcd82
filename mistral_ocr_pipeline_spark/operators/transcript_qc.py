"""Conversation-level quality control for multi-turn transcript tables
(the BASELINE.json input shape: conv_id, turn_idx, role, text, tool, ts).

The extraction pipeline (`plans/extract_pipeline`) treats every turn
independently and guarantees stable ordering on the way out; these
operators audit the INPUT side — the malformed-conversation classes an
agent-transcript warehouse actually accumulates (retry storms duplicating
turn indices, dropped turns leaving gaps, clock skew inverting
timestamps, tool loops breaking role alternation) — and deduplicate at
conversation granularity, where near-identical re-ingested sessions
dodge the per-turn/document dedup passes.

Both operators are pure Catalyst expressions over ONE shuffle keyed by
conv_id (the window and the groupBy share the exchange), so they run at
transcript-warehouse scale exactly like the extraction pipeline itself:
per-conversation state never exceeds one task, and a hot conversation is
bounded by its own turn count, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col


def transcript_integrity(df: DataFrame) -> DataFrame:
    """Per-conversation integrity audit.

    Returns one row per conv_id:

    * ``n_turns``            — raw row count;
    * ``n_idx``              — distinct turn_idx count;
    * ``dup_turns``          — rows sharing a turn_idx with another row
      (retry/ingest double-writes), ``n_turns − n_idx``;
    * ``has_gaps``           — the distinct indices do NOT form the
      contiguous range [min_idx, max_idx];
    * ``starts_at_zero``     — min(turn_idx) = 0;
    * ``role_repeats``       — adjacent turns (stable order: turn_idx,
      ts, role) carrying the SAME role — broken user/assistant
      alternation, the tool-loop smell;
    * ``ts_inversions``      — adjacent turns whose timestamp moves
      BACKWARD (clock skew / out-of-order ingest; NULL-safe: pairs with
      a NULL ts on either side don't count).

    One window + one groupBy, both keyed conv_id — a single exchange.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    stepped = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        (F.lag("role").over(w) == F.col("role")).alias("_rep"),
        (F.lag("ts").over(w) > F.col("ts")).alias("_inv"),
    )
    return stepped.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("turn_idx").alias("n_idx"),
        (F.count(F.lit(1)) - F.countDistinct("turn_idx")).alias("dup_turns"),
        (
            (F.max("turn_idx") - F.min("turn_idx") + 1)
            != F.countDistinct("turn_idx")
        ).alias("has_gaps"),
        (F.min("turn_idx") == F.lit(0)).alias("starts_at_zero"),
        F.sum(F.when(F.col("_rep"), 1).otherwise(0))
        .cast("long")
        .alias("role_repeats"),
        F.sum(F.when(F.col("_inv"), 1).otherwise(0))
        .cast("long")
        .alias("ts_inversions"),
    )


def transcript_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(conv_id, n_turns, fingerprint): md5 over the conversation's
    normalized turn texts concatenated in stable (turn_idx, text) order
    with an unprintable separator — the conversation-granularity exact-
    dedup key.  Normalization is the shared matching key
    (`norm_key_col`), so trivial re-ingest diffs (case, punctuation,
    whitespace) don't split a group; NULL text folds to ''.

    Order-insensitive aggregation + an explicit array_sort keeps the
    fingerprint partition-invariant (collect_list alone has no order
    guarantee)."""
    txt = F.coalesce(norm_key_col(F.col(text_col)), F.lit(""))
    per = df.select(
        "conv_id", F.struct(F.col("turn_idx"), txt.alias("t")).alias("e")
    )
    return per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["t"]
                ),
                "\x1f",
            )
        ).alias("fingerprint"),
    )


def transcript_dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Conversation-level exact dedup: fingerprint groups, canonical =
    lowest conv_id per group.  Returns (conv_id, fingerprint, n_turns,
    group_size, is_canonical) — filter ``is_canonical`` to keep one
    session per re-ingested clone set.

    Two exchanges total: the conv_id groupBy inside
    `transcript_fingerprint`, then one fingerprint-keyed window over the
    CONVERSATION-sized (not turn-sized) relation."""
    fp = transcript_fingerprint(df, text_col)
    w = W.partitionBy("fingerprint")
    return fp.select(
        "conv_id",
        "fingerprint",
        "n_turns",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("conv_id") == F.min("conv_id").over(w)).alias("is_canonical"),
    )

def transcript_prefix_dedup(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Retry/regeneration BRANCH dedup: conversations sharing the same
    first-``k``-turn prefix are one branch family (an agent warehouse
    accumulates these when a session is regenerated from turn k onward —
    identical opening, divergent tail — which whole-conversation
    fingerprints can never group).  Canonical = the LONGEST branch
    (max n_turns, tie → lexicographic min conv_id): keep the most
    complete trajectory, drop the abandoned retries.

    Grouping key = md5 over the normalized texts of the first
    min(k, n_turns) turns in stable (turn_idx, text) order — a
    shorter-than-k conversation is its own class (its prefix is all of
    it), so a 2-turn stub never absorbs a 10-turn session; run
    `transcript_dedup_exact` first if exact clones should collapse
    before branching is judged.

    Plan: ONE conv_id-keyed groupBy builds (prefix_fp, n_turns) per
    conversation, then two same-partition windows over the
    CONVERSATION-sized relation (group_size/max, then the conditional
    min over the longest members) — a single prefix-keyed exchange,
    never turn-sized.

    Returns (conv_id, prefix_fp, n_turns, group_size, is_canonical)."""
    txt = F.coalesce(norm_key_col(F.col(text_col)), F.lit(""))
    per = df.select(
        "conv_id", F.struct(F.col("turn_idx"), txt.alias("t")).alias("e")
    )
    fp = per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("e")), 1, k),
                    lambda s: s["t"],
                ),
                "\x1f",
            )
        ).alias("prefix_fp"),
    )
    w = W.partitionBy("prefix_fp")
    sized = fp.select(
        "conv_id",
        "prefix_fp",
        "n_turns",
        F.count(F.lit(1)).over(w).alias("group_size"),
        F.max("n_turns").over(w).alias("_mx"),
    )
    return sized.select(
        "conv_id",
        "prefix_fp",
        "n_turns",
        "group_size",
        (
            F.col("conv_id")
            == F.min(
                F.when(F.col("n_turns") == F.col("_mx"), F.col("conv_id"))
            ).over(w)
        ).alias("is_canonical"),
    )


def transcript_loss_mask(
    df: DataFrame,
    trainable_roles: tuple[str, ...] = ("assistant",),
    text_col: str = "text",
) -> DataFrame:
    """SFT loss-mask accounting: per conversation, how many tokens would
    actually train.  A turn is TRAINABLE iff its role is in
    ``trainable_roles`` (assistant turns train; user/system/tool turns
    are context) — the standard instruction-tuning mask.  Conversations
    with a near-zero trainable ratio are context-heavy tool logs that
    cost sequence length without teaching anything; gate on the ratio
    before packing.

    Whitespace token basis (`text_analysis.ws_token_count` semantics) so
    the numbers replay in SQL; swap in the trained-BPE kernel for
    trainer-exact budgets.  One map-side-combinable conv_id groupBy —
    no windows, no text on the shuffle (counts only).

    Returns (conv_id, n_turns, n_trainable_turns, tokens_total,
    tokens_trainable, trainable_ratio_r6)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    trainable = F.col("role").isin(*trainable_roles)
    per = df.select(
        "conv_id",
        toks.alias("_tok"),
        F.when(trainable, toks).otherwise(F.lit(0)).alias("_tok_tr"),
        F.when(trainable, 1).otherwise(0).alias("_is_tr"),
    )
    return per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_is_tr").cast("long").alias("n_trainable_turns"),
        F.sum("_tok").cast("long").alias("tokens_total"),
        F.sum("_tok_tr").cast("long").alias("tokens_trainable"),
        F.round(
            F.sum("_tok_tr")
            / F.greatest(F.sum("_tok"), F.lit(1)).cast("double"),
            6,
        ).alias("trainable_ratio_r6"),
    )


def transcript_render_sft(
    df: DataFrame,
    trainable_roles: tuple[str, ...] = ("assistant",),
    text_col: str = "text",
) -> DataFrame:
    """Render each conversation into THE training artifact an SFT
    trainer consumes: one string with role tags
    (``<|role|>text``, turns joined by newline) plus the character-level
    trainable spans — ``start:end`` offsets of each trainable turn's
    text inside the rendered string, comma-joined so the span list is a
    flat engine-portable string (the trainer masks loss outside them).
    The render twin of `transcript_loss_mask` (which only counts): here
    the mask becomes byte offsets a tokenizer-side masker can apply.

    Plan: per-turn piece + start offset via ONE cumulative window over
    (conv_id, turn_idx), then ONE conv_id groupBy whose ordered
    reassembly is an array_sort over (turn_idx, piece) structs — the
    same exchange serves both (window partitioning satisfies the agg),
    so a conversation costs one shuffle.  NULL text renders as the
    empty string (role tag survives), keeping offsets well-defined.

    Returns (conv_id, rendered, train_spans, n_turns, n_trainable)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    piece = F.concat(F.lit("<|"), F.col("role"), F.lit("|>"), txt)
    plen = F.length(F.concat(F.lit("<|"), F.col("role"), F.lit("|>")))
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    trainable = F.col("role").isin(*trainable_roles)
    per = df.select(
        "conv_id",
        "turn_idx",
        piece.alias("_piece"),
        (
            F.coalesce(F.sum(F.length(piece) + 1).over(w), F.lit(0)) + plen
        ).alias("_s"),
        F.length(txt).alias("_tlen"),
        trainable.alias("_tr"),
    )
    span = F.concat_ws(
        ":", F.col("_s").cast("string"), (F.col("_s") + F.col("_tlen")).cast("string")
    )
    return per.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "_piece"))),
                lambda s: s["_piece"],
            ),
            "\n",
        ).alias("rendered"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_tr"), F.struct("turn_idx", span.alias("_sp")))
                    )
                ),
                lambda s: s["_sp"],
            ),
            ",",
        ).alias("train_spans"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("_tr").cast("long")).alias("n_trainable"),
    )


def transcript_context_windows(
    df: DataFrame, budget: int = 512, text_col: str = "text"
) -> DataFrame:
    """Turn-aligned context-window split of long conversations: lay the
    turns out in stable turn order, cut at ``budget``-token boundaries
    WITHOUT splitting a turn (the conversation analog of
    `packing.pack_token_budget`'s document-preserving cut — a window can
    overflow by at most one turn).  Each (conv_id, win_id) group is one
    training sequence; downstream packing/emit reuses the pack_emit
    rebuild discipline.

    Whitespace token basis for SQL replay.  ONE conv_id-keyed window
    (sort + running cumsum); per-task state is bounded by a single
    conversation's turn count, so a 10¹²-turn table splits exactly as
    wide as its conv_id cardinality.

    Cumsum order is (turn_idx, ts, role, md5(text)) — the shared stable
    convention plus a content tie-break, so retry DOUBLE-WRITES (two
    rows sharing a turn_idx, the class `transcript_integrity` audits)
    still get partition-invariant offsets; rows identical in all four
    keys are byte-identical and interchangeable.

    Returns (conv_id, turn_idx, role, turn_tokens, start_offset,
    win_id)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    order = ["turn_idx"] + (["ts"] if "ts" in df.columns else [])
    w = W.partitionBy("conv_id").orderBy(
        *order, "role", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )
    run = w.rowsBetween(W.unboundedPreceding, -1)
    return (
        df.withColumn("turn_tokens", toks)
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("turn_tokens").over(run), F.lit(0)).cast("long"),
        )
        .withColumn(
            "win_id",
            F.floor(F.col("start_offset") / F.lit(budget)).cast("long"),
        )
        .select(
            "conv_id", "turn_idx", "role", "turn_tokens",
            "start_offset", "win_id",
        )
    )


def transcript_role_transitions(df: DataFrame) -> DataFrame:
    """Corpus-level role-transition matrix: (from_role, to_role, n) over
    adjacent turns in stable (turn_idx, ts, role) order — the structural
    health dashboard of an agent-transcript warehouse (user→assistant
    should dominate; heavy assistant→assistant means retry double-writes;
    a fat tool→tool diagonal means unbounded tool loops).

    One conv_id-keyed window exchange, then the matrix rollup collapses
    map-side to ≤|roles|² rows — nothing corpus-sized moves twice."""
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    stepped = df.select(
        "conv_id", F.lag("role").over(w).alias("from_role"), F.col("role").alias("to_role")
    ).filter(F.col("from_role").isNotNull())
    return stepped.groupBy("from_role", "to_role").agg(
        F.count(F.lit(1)).alias("n")
    )


def transcript_script_mismatch(df: DataFrame) -> DataFrame:
    """Wrong-language-response detector: per conversation, does any
    ASSISTANT turn answer in a Unicode script no USER turn of that
    conversation used?  (A Cyrillic question answered in Latin — or the
    reverse — is a turn an SFT gate should flag regardless of its
    quality score; per-turn langid can't see it because each turn is
    individually fine.)  'none' turns (no script characters) assert
    nothing in either direction, and a conversation with zero scripted
    user turns reports 0 mismatches — there is no reference to violate.

    Output: (conv_id, n_user_scripts, n_asst_scripts,
    n_mismatched_asst_turns, script_mismatch).

    Scale shape: the dominant-script verdict is a map-only expression
    per turn (`text_analysis.dominant_script_col`); everything after is
    keyed on conv_id — a distinct-count rollup, the tiny per-conv
    distinct user-script relation, and one left-anti membership join.
    Per-conversation state is bounded by its own script diversity (≤6),
    never by turn volume."""
    from mistral_ocr_pipeline_spark.operators.text_analysis import (
        dominant_script_col,
    )

    dom = df.select(
        "conv_id",
        "role",
        dominant_script_col(F.col("text")).alias("dominant_script"),
    )
    scripted = dom.filter(F.col("dominant_script") != "none")
    base = dom.groupBy("conv_id").agg(
        F.count_distinct(
            F.when(
                (F.col("role") == "user")
                & (F.col("dominant_script") != "none"),
                F.col("dominant_script"),
            )
        ).cast("int").alias("n_user_scripts"),
        F.count_distinct(
            F.when(
                (F.col("role") == "assistant")
                & (F.col("dominant_script") != "none"),
                F.col("dominant_script"),
            )
        ).cast("int").alias("n_asst_scripts"),
    )
    user_scripts = (
        scripted.filter(F.col("role") == "user")
        .select("conv_id", "dominant_script")
        .distinct()
    )
    asst = scripted.filter(F.col("role") == "assistant").select(
        "conv_id", "dominant_script"
    )
    mismatched = (
        asst.join(user_scripts.select("conv_id").distinct(), "conv_id")
        .join(user_scripts, ["conv_id", "dominant_script"], "left_anti")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mismatched_asst_turns"))
    )
    return (
        base.join(mismatched, "conv_id", "left")
        .select(
            "conv_id",
            "n_user_scripts",
            "n_asst_scripts",
            F.coalesce(
                F.col("n_mismatched_asst_turns"), F.lit(0)
            ).cast("long").alias("n_mismatched_asst_turns"),
            (
                F.coalesce(F.col("n_mismatched_asst_turns"), F.lit(0)) > 0
            ).alias("script_mismatch"),
        )
    )


def transcript_tool_stats(df: DataFrame) -> DataFrame:
    """Per-conversation agent-trace analytics over the ``tool`` column:

    * ``n_tool_turns`` / ``n_distinct_tools`` — tool-call volume;
    * ``n_tool_errors`` — tool turns whose text carries an error marker
      (case-insensitive 'error' — swap for the warehouse's real status
      field when one exists);
    * ``max_tool_run`` — the longest CONSECUTIVE run of tool turns in
      stable turn order (0 when the conversation never calls a tool):
      the unbounded-tool-loop smell, quantified via gaps-and-islands
      (global row_number minus tool-only row_number is constant within
      a run).

    Two same-key windows + one groupBy — a single conv_id exchange; the
    island rollup is conversation-bounded."""
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    is_tool = F.col("tool").isNotNull()
    stepped = df.select(
        "conv_id",
        "tool",
        is_tool.alias("_it"),
        F.when(
            is_tool & F.lower(F.coalesce(F.col("text"), F.lit(""))).contains(
                "error"
            ),
            1,
        )
        .otherwise(0)
        .alias("_err"),
        F.row_number().over(w).alias("_rn"),
        F.when(is_tool, F.row_number().over(
            W.partitionBy("conv_id", is_tool).orderBy("turn_idx", "ts", "role")
        )).alias("_rt"),
    )
    runs = (
        stepped.filter("_it")
        .groupBy("conv_id", (F.col("_rn") - F.col("_rt")).alias("_island"))
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy("conv_id")
        .agg(F.max("_run").alias("max_tool_run"))
    )
    base = stepped.groupBy("conv_id").agg(
        F.sum(F.when(F.col("_it"), 1).otherwise(0)).cast("long").alias(
            "n_tool_turns"
        ),
        F.countDistinct("tool").alias("n_distinct_tools"),
        F.sum("_err").cast("long").alias("n_tool_errors"),
    )
    return base.join(runs, "conv_id", "left").select(
        "conv_id",
        "n_tool_turns",
        "n_distinct_tools",
        "n_tool_errors",
        F.coalesce(F.col("max_tool_run"), F.lit(0)).cast("long").alias(
            "max_tool_run"
        ),
    )


def transcript_refusal_flags(df: DataFrame) -> DataFrame:
    """Assistant-turn degeneracy gate — the SFT-data quality filter for
    refusals and empty completions: per conversation,

    * ``n_assistant`` — assistant turns;
    * ``n_refusals`` — assistant turns opening-matching a refusal marker
      ('i cannot', 'i can''t', 'i'm sorry', 'as an ai' — the standard
      published refusal heuristics, case-insensitive substring);
    * ``n_empty_assistant`` — assistant turns whose text is NULL/blank;
    * ``keep`` — no refusals AND no empty completions AND at least one
      assistant turn (a conversation with nothing to train on fails).

    Scan-level CASE expressions + one map-side-combinable conv_id
    groupBy — zero windows, counts-only shuffle."""
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))
    is_asst = F.col("role") == "assistant"
    refusal = (
        low.contains("i cannot")
        | low.contains("i can't")
        | low.contains("i'm sorry")
        | low.contains("as an ai")
    )
    per = df.select(
        "conv_id",
        F.when(is_asst, 1).otherwise(0).alias("_a"),
        F.when(is_asst & refusal, 1).otherwise(0).alias("_r"),
        F.when(is_asst & (F.trim(F.coalesce(F.col("text"), F.lit(""))) == ""), 1)
        .otherwise(0)
        .alias("_e"),
    )
    return per.groupBy("conv_id").agg(
        F.sum("_a").cast("long").alias("n_assistant"),
        F.sum("_r").cast("long").alias("n_refusals"),
        F.sum("_e").cast("long").alias("n_empty_assistant"),
        (
            (F.sum("_r") == 0) & (F.sum("_e") == 0) & (F.sum("_a") > 0)
        ).alias("keep"),
    )


def conversation_texts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(conv_id, conv_text): each conversation's raw turn texts joined
    with a single space in stable (turn_idx, text) order — the
    conversation-granularity DOCUMENT for near-dup/embedding passes
    (feed to `dedup.minhash_lsh_pairs` for conversation near-dup; the
    shingler normalizes downstream, so no key-normalization here).
    Same ordered-struct rebuild discipline as `transcript_fingerprint`;
    one conv_id exchange."""
    per = df.select(
        "conv_id",
        F.struct(
            F.col("turn_idx"), F.coalesce(F.col(text_col), F.lit("")).alias("t")
        ).alias("e"),
    )
    return per.groupBy("conv_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("e")), lambda s: s["t"]),
            " ",
        ).alias("conv_text")
    )

def transcript_preference_pairs(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Preference-pair (DPO-shape) extraction from retry branches: when a
    warehouse holds several regenerations of the same conversation
    (identical first ``k`` turns, divergent continuations —
    `transcript_prefix_dedup`'s branch families), the POSITION-``k``
    completions form natural (prompt, chosen, rejected) training pairs:
    chosen = the canonical (longest, i.e. the branch the user kept
    going with) branch's (k+1)-th turn in stable order; rejected =
    every other branch's, when the normalized texts actually differ.

    Positional, not index-valued, throughout — the prefix fingerprint
    groups by the first k turns IN STABLE (turn_idx, text) ORDER, so
    the completion must be the (k+1)-th turn in that same order;
    selecting ``turn_idx == k`` instead would silently break on
    1-based or gapped indices (it would pick a turn inside the shared
    prefix, making chosen == rejected and dropping the pair).

    The 'longest branch won' preference signal is a heuristic — swap
    ``is_canonical`` for an explicit rating join when one exists; the
    pairing/plumbing is the same.

    Plan: ONE turn-level conv_id groupBy builds each conversation's
    ordered (prompt, completion) pair alongside the family relation
    (both conversation-sized, persisted at the boundary so the three
    consuming branches don't re-run the corpus aggregation); the
    chosen×rejected pairing moves branch counts, not turns.  Families
    whose canonical branch has no (k+1)-th turn produce no pairs.

    Returns (prefix_fp, chosen_conv, rejected_conv, prompt_text,
    chosen_text, rejected_text)."""
    fam = transcript_prefix_dedup(df, k=k, text_col=text_col).filter(
        F.col("group_size") >= 2
    )
    raw = F.coalesce(F.col(text_col), F.lit(""))
    per_conv = (
        df.select(
            "conv_id",
            F.struct(F.col("turn_idx"), raw.alias("t")).alias("e"),
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("e")).alias("_arr"))
        .select(
            "conv_id",
            F.array_join(
                F.transform(F.slice("_arr", 1, k), lambda s: s["t"]), "\n"
            ).alias("_prompt"),
            F.try_element_at("_arr", F.lit(k + 1))["t"].alias("_tk"),
        )
    )
    j = fam.join(per_conv, "conv_id").filter(F.col("_tk").isNotNull()).persist()
    chosen = j.filter("is_canonical").select(
        "prefix_fp",
        F.col("conv_id").alias("chosen_conv"),
        F.col("_prompt").alias("prompt_text"),
        F.col("_tk").alias("chosen_text"),
    )
    rejected = j.filter(~F.col("is_canonical")).select(
        "prefix_fp",
        F.col("conv_id").alias("rejected_conv"),
        F.col("_tk").alias("rejected_text"),
    )
    return (
        chosen.join(rejected, "prefix_fp")
        .filter(
            norm_key_col(F.col("chosen_text"))
            != norm_key_col(F.col("rejected_text"))
        )
        .select(
            "prefix_fp",
            "chosen_conv",
            "rejected_conv",
            "prompt_text",
            "chosen_text",
            "rejected_text",
        )
    )


def transcript_latency_stats(df: DataFrame) -> DataFrame:
    """Assistant response-latency rollup — the agent-warehouse SLO
    metric: per conversation, the seconds between each assistant turn
    and the turn before it (stable turn order; pairs with a NULL ts on
    either side don't count).

    Returns (conv_id, n_replies, mean_latency_r6, max_latency_s).
    One conv_id-keyed window exchange shared with the rollup."""
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    prev_ts = F.lag("ts").over(w)
    lat = F.when(
        (F.col("role") == "assistant")
        & prev_ts.isNotNull()
        & F.col("ts").isNotNull(),
        F.col("ts").cast("double") - prev_ts.cast("double"),
    )
    return (
        df.select("conv_id", lat.alias("_lat"))
        .groupBy("conv_id")
        .agg(
            F.count("_lat").alias("n_replies"),
            F.round(F.avg("_lat"), 6).alias("mean_latency_r6"),
            F.max("_lat").alias("max_latency_s"),
        )
    )

def transcript_conv_facts(
    df: DataFrame,
    trainable_roles: tuple[str, ...] = ("assistant",),
    text_col: str = "text",
) -> DataFrame:
    """ONE-exchange fusion of the per-conversation fact passes —
    `transcript_integrity` + `transcript_refusal_flags` +
    `transcript_loss_mask` + `transcript_fingerprint` computed together:
    the à-la-carte operators each shuffle the TURN table on conv_id, so
    a pipeline that gates on all four would pay four corpus exchanges;
    this fused form pays one (the lag window and the groupBy share the
    conv_id exchange), which is the difference that matters at 10¹²
    turns.  Column semantics are exactly the individual operators':
    in particular n_assistant / n_refusals / n_empty_assistant ALWAYS
    count role='assistant' (`transcript_refusal_flags` parity — the
    refusal heuristic is assistant-specific and must not drift when
    ``trainable_roles`` widens, e.g. to ('assistant','tool')); only
    the token columns follow ``trainable_roles``.

    Returns one row per conv_id: n_turns, dup_turns, has_gaps,
    starts_at_zero, role_repeats, ts_inversions, n_assistant,
    n_refusals, n_empty_assistant, tokens_total, tokens_trainable,
    trainable_ratio_r6, fingerprint."""
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    raw = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(raw)
    trimmed = F.trim(raw)
    toks = (
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
    )
    is_tr = F.col("role").isin(*trainable_roles)
    is_asst = F.col("role") == "assistant"
    refusal = (
        low.contains("i cannot")
        | low.contains("i can't")
        | low.contains("i'm sorry")
        | low.contains("as an ai")
    )
    stepped = df.select(
        "conv_id",
        "turn_idx",
        (F.lag("role").over(w) == F.col("role")).alias("_rep"),
        (F.lag("ts").over(w) > F.col("ts")).alias("_inv"),
        F.when(is_asst, 1).otherwise(0).alias("_a"),
        F.when(is_asst & refusal, 1).otherwise(0).alias("_r"),
        F.when(is_asst & (trimmed == ""), 1).otherwise(0).alias("_e"),
        toks.alias("_tok"),
        F.when(is_tr, toks).otherwise(F.lit(0)).alias("_tok_tr"),
        F.struct(
            F.col("turn_idx"),
            F.coalesce(norm_key_col(F.col(text_col)), F.lit("")).alias("t"),
        ).alias("_fe"),
    )
    return stepped.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.count(F.lit(1)) - F.countDistinct("turn_idx")).alias("dup_turns"),
        (
            (F.max("turn_idx") - F.min("turn_idx") + 1)
            != F.countDistinct("turn_idx")
        ).alias("has_gaps"),
        (F.min("turn_idx") == F.lit(0)).alias("starts_at_zero"),
        F.sum(F.when(F.col("_rep"), 1).otherwise(0))
        .cast("long")
        .alias("role_repeats"),
        F.sum(F.when(F.col("_inv"), 1).otherwise(0))
        .cast("long")
        .alias("ts_inversions"),
        F.sum("_a").cast("long").alias("n_assistant"),
        F.sum("_r").cast("long").alias("n_refusals"),
        F.sum("_e").cast("long").alias("n_empty_assistant"),
        F.sum("_tok").cast("long").alias("tokens_total"),
        F.sum("_tok_tr").cast("long").alias("tokens_trainable"),
        F.round(
            F.sum("_tok_tr")
            / F.greatest(F.sum("_tok"), F.lit(1)).cast("double"),
            6,
        ).alias("trainable_ratio_r6"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_fe")), lambda s: s["t"]
                ),
                "\x1f",
            )
        ).alias("fingerprint"),
    )

def transcript_template_lint(df: DataFrame) -> DataFrame:
    """Chat-template conformance lint — the structural contract an SFT
    trainer's template renderer assumes, checked per conversation:

    * ``first_role``        — role of the first turn (stable order);
      a conforming conversation opens with ``system`` or ``user``;
    * ``n_late_system``     — system turns anywhere but position 1
      (mid-conversation system injections break most templates);
    * ``n_orphan_tools``    — tool turns not directly preceded by an
      assistant turn or another tool turn (a tool result with no
      requesting assistant call);
    * ``n_alt_violations``  — among user/assistant turns only, adjacent
      same-role pairs (broken alternation AFTER tool/system turns are
      excused — stricter than `transcript_integrity`'s raw
      ``role_repeats``, which counts tool→tool loops too);
    * ``template_ok``       — opens correctly and all three counts are 0.

    Two windows on the same conv_id exchange (the full-order lag and the
    user/assistant-subset lag via the (conv_id, is_ua) partition trick —
    same islands discipline as `transcript_tool_stats`), then one
    map-side-combinable rollup."""
    order = ["turn_idx", "ts", "role"]
    w_all = W.partitionBy("conv_id").orderBy(*order)
    is_ua = F.col("role").isin("user", "assistant")
    w_ua = W.partitionBy("conv_id", is_ua).orderBy(*order)
    stepped = df.select(
        "conv_id",
        "role",
        F.row_number().over(w_all).alias("_rn"),
        F.lag("role").over(w_all).alias("_prev"),
        F.when(is_ua, F.lag("role").over(w_ua)).alias("_prev_ua"),
        is_ua.alias("_ua"),
    )
    late_sys = (F.col("role") == "system") & (F.col("_rn") > 1)
    orphan = (F.col("role") == "tool") & (
        F.col("_prev").isNull() | ~F.col("_prev").isin("assistant", "tool")
    )
    alt_bad = F.col("_ua") & (F.col("_prev_ua") == F.col("role"))
    return stepped.groupBy("conv_id").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("role"))).alias("first_role"),
        F.sum(F.when(late_sys, 1).otherwise(0)).cast("long").alias(
            "n_late_system"
        ),
        F.sum(F.when(orphan, 1).otherwise(0)).cast("long").alias(
            "n_orphan_tools"
        ),
        F.sum(F.when(alt_bad, 1).otherwise(0)).cast("long").alias(
            "n_alt_violations"
        ),
        (
            F.max(F.when(F.col("_rn") == 1, F.col("role"))).isin(
                "system", "user"
            )
            & (F.sum(F.when(late_sys, 1).otherwise(0)) == 0)
            & (F.sum(F.when(orphan, 1).otherwise(0)) == 0)
            & (F.sum(F.when(alt_bad, 1).otherwise(0)) == 0)
        ).alias("template_ok"),
    )

def transcript_hot_turns(
    df: DataFrame, min_convs: int = 3, text_col: str = "text"
) -> DataFrame:
    """Cross-conversation boilerplate-turn detection — the C4 hot-line
    strip at TURN granularity: a turn whose normalized text recurs in
    ``min_convs``+ distinct conversations is template boilerplate
    ("How can I help you today?", canned tool banners), which inflates
    the loss on content a model has seen thousands of times.  Flags,
    doesn't delete — feed ``is_hot`` to the loss mask (train on the
    turn's conversation, not the boilerplate) or strip before packing.

    Same digest discipline as `dedup.line_dedup`: the conv-distinct
    count groups by an 8-byte md5, never the text; empty/NULL turns are
    never hot (nothing to learn either way).  One map-side-combinable
    groupBy over digests + one digest-keyed join back — no windows, no
    text on any shuffle.

    Returns every turn: (conv_id, turn_idx, role, n_convs_sharing,
    is_hot)."""
    key = norm_key_col(F.coalesce(F.col(text_col), F.lit("")))
    keyed = df.select(
        "conv_id", "turn_idx", "role", F.md5(key).alias("_d"),
        (F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "").alias("_empty"),
    )
    freq = keyed.groupBy("_d").agg(
        F.countDistinct("conv_id").alias("n_convs_sharing")
    )
    return keyed.join(freq, "_d").select(
        "conv_id",
        "turn_idx",
        "role",
        "n_convs_sharing",
        (
            (F.col("n_convs_sharing") >= min_convs) & ~F.col("_empty")
        ).alias("is_hot"),
    )


def preference_pair_stats(pairs: DataFrame) -> DataFrame:
    """Length-bias audit over a preference-pair relation (the
    `transcript_preference_pairs` output shape): DPO-style training is
    notoriously length-hacked — if 'chosen' is systematically longer,
    the model learns verbosity, not preference.  One-row corpus report:

    * ``n_pairs``;
    * ``mean_len_delta_r6``  — mean(chosen tokens − rejected tokens);
    * ``frac_chosen_longer_r6`` / ``frac_equal_len_r6``;
    * ``mean_chosen_tokens_r6`` / ``mean_rejected_tokens_r6``.

    Whitespace token basis; pure map-side aggregation to one row."""

    def toks(c):
        t = F.trim(F.coalesce(F.col(c), F.lit("")))
        return (
            F.when(t == "", F.lit(0))
            .otherwise(F.size(F.split(t, r"\s+")))
            .cast("long")
        )

    per = pairs.select(
        toks("chosen_text").alias("_c"), toks("rejected_text").alias("_r")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.col("_c") - F.col("_r")), 6).alias(
            "mean_len_delta_r6"
        ),
        F.round(
            F.avg(F.when(F.col("_c") > F.col("_r"), 1.0).otherwise(0.0)), 6
        ).alias("frac_chosen_longer_r6"),
        F.round(
            F.avg(F.when(F.col("_c") == F.col("_r"), 1.0).otherwise(0.0)), 6
        ).alias("frac_equal_len_r6"),
        F.round(F.avg("_c"), 6).alias("mean_chosen_tokens_r6"),
        F.round(F.avg("_r"), 6).alias("mean_rejected_tokens_r6"),
    )


def transcript_echo(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    source_roles: tuple[str, ...] = ("user", "tool"),
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Assistant ECHO detection: for every assistant turn, the fraction of
    its distinct word ``k``-grams that already appeared in an EARLIER
    ``source_roles`` turn of the same conversation.  An assistant reply
    that mostly restates the prompt (or regurgitates a tool result
    verbatim) carries no training signal for SFT — and verbatim
    regurgitation is itself a behavior to curate against; this is the
    turn-level twin of the corpus-level substring/containment dedup
    family.

    Plan shape: grams are md5 digests computed MAP-SIDE over the
    normalized token array (shuffles move 32-char digests, never text).
    The earlier-turn check avoids a pair fan-out: source grams first
    collapse to ``(conv_id, g) -> min(turn_idx)`` (partial-agg combine),
    then ONE equi-join on (conv_id, g) with ``first_turn < turn_idx``
    decides "appeared earlier" — per-conversation keys, so conv_id-salted
    AQE handles long-conversation skew like the rest of the transcript
    battery.

    Returns one row per assistant turn: (conv_id, turn_idx, n_grams,
    n_echoed, echo_fraction, is_echo); turns shorter than ``k`` words
    survive with n_grams = 0."""
    base = _echo_tokens(df, text_col)
    a_grams = _echo_grams(base.filter(F.col("role") == "assistant"), k)
    s_first = (
        _echo_grams(base.filter(F.col("role").isin(*source_roles)), k)
        .groupBy("conv_id", "g")
        .agg(F.min("turn_idx").alias("first_turn"))
    )
    counts = (
        a_grams.join(s_first, ["conv_id", "g"], "left")
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_turn") < F.col("turn_idx"), 1).otherwise(0)
            ).alias("n_echoed"),
        )
    )
    spine = base.filter(F.col("role") == "assistant").select("conv_id", "turn_idx")
    return _echo_assemble(spine, counts, flag_threshold)


def _echo_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """(conv_id, turn_idx, role, w): normalized token array per turn —
    materialized as a column so the gram lambda indexes it O(1) instead of
    re-normalizing per gram (the `_ngrams_from_tokens` rule)."""
    txt = F.coalesce(norm_key_col(F.col(text_col)), F.lit(""))
    words = F.filter(F.split(txt, " "), lambda x: x != "")
    return df.select("conv_id", "turn_idx", "role", words.alias("w"))


def _echo_grams(frame: DataFrame, k: int) -> DataFrame:
    """(conv_id, turn_idx, g): DISTINCT md5 word-k-gram digests per turn,
    computed map-side — downstream shuffles move 32-char digests, never
    text."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - k),
        lambda p: F.md5(F.array_join(F.slice("w", p + 1, k), " ")),
    )
    return frame.filter(F.size("w") >= k).select(
        "conv_id",
        "turn_idx",
        F.explode(F.array_distinct(grams)).alias("g"),
    )


def _echo_assemble(
    spine: DataFrame, counts: DataFrame, flag_threshold: float
) -> DataFrame:
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    n_echoed = F.coalesce(F.col("n_echoed"), F.lit(0)).cast("long")
    frac = n_echoed / F.greatest(n_grams, F.lit(1))
    return spine.join(counts, ["conv_id", "turn_idx"], "left").select(
        "conv_id",
        "turn_idx",
        n_grams.alias("n_grams"),
        n_echoed.alias("n_echoed"),
        F.round(frac, 6).alias("echo_fraction"),
        ((n_grams > 0) & (frac >= F.lit(float(flag_threshold)))).alias("is_echo"),
    )


def build_echo_index(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    source_roles: tuple[str, ...] = ("user", "tool"),
) -> DataFrame:
    """Persisted echo-source index: ``(conv_id, g, first_turn)`` — the
    earliest ``source_roles`` turn in each conversation containing each
    distinct word-k-gram digest.  At 10^12 turns new batches score their
    assistant turns against ALL conversation history through this table
    WITHOUT re-tokenizing history text (the `build_substring_index`
    convention applied to the transcript payload).  The one stored fact
    is a min-lattice (min of mins = global min), which is what makes
    `echo_index_append` exactly rebuild-equivalent.  Stores a digest and
    one integer per distinct (conv, gram) — no text."""
    base = _echo_tokens(df, text_col)
    return (
        _echo_grams(base.filter(F.col("role").isin(*source_roles)), k)
        .groupBy("conv_id", "g")
        .agg(F.min("turn_idx").alias("first_turn"))
    )


def echo_index_append(
    index: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    source_roles: tuple[str, ...] = ("user", "tool"),
) -> DataFrame:
    """Merge a new batch's source turns into a `build_echo_index` table —
    EXACT one-shot equivalence (hash-identical to rebuilding over
    history ∪ batch) because min(first_turn) is a lattice merge.  Only
    the increment is tokenized; history costs one full-outer shuffle of
    the digest index, O(index) not O(history text)."""
    delta = build_echo_index(new_df, text_col, k, source_roles)
    a = index.withColumnRenamed("first_turn", "_fa")
    b = delta.withColumnRenamed("first_turn", "_fb")
    return a.join(b, ["conv_id", "g"], "full").select(
        "conv_id",
        "g",
        F.least(F.col("_fa"), F.col("_fb")).alias("first_turn"),
    )


def transcript_echo_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    k: int = 5,
    source_roles: tuple[str, ...] = ("user", "tool"),
    flag_threshold: float = 0.5,
) -> DataFrame:
    """`transcript_echo` for a NEW batch of turns against history ∪
    batch, reading only the persisted echo index for history — never its
    text.  EXACTLY equivalent, for the batch's assistant turns, to
    running the one-shot over history ∪ batch: a gram counts as echoed
    iff the GLOBAL earliest source occurrence (least of the index's
    first_turn and the batch's own source grams' first_turn — least
    skips NULLs) precedes the assistant turn, which is the same
    strictly-earlier rule the one-shot applies.

    Plan: batch grams (map-side digests) → one groupBy for the batch
    source side → TWO left equi-joins from the assistant gram stream
    (against the index on (conv_id, g) — the batch side is small, AQE
    broadcasts it for real corpora — and against the batch source
    collapse) → per-turn rollup."""
    base = _echo_tokens(new_df, text_col)
    a_grams = _echo_grams(base.filter(F.col("role") == "assistant"), k)
    b_src = (
        _echo_grams(base.filter(F.col("role").isin(*source_roles)), k)
        .groupBy("conv_id", "g")
        .agg(F.min("turn_idx").alias("_fb"))
    )
    hist = index.withColumnRenamed("first_turn", "_fa")
    first = F.least(F.col("_fa"), F.col("_fb"))
    counts = (
        a_grams.join(hist, ["conv_id", "g"], "left")
        .join(b_src, ["conv_id", "g"], "left")
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(first < F.col("turn_idx"), 1).otherwise(0)
            ).alias("n_echoed"),
        )
    )
    spine = base.filter(F.col("role") == "assistant").select("conv_id", "turn_idx")
    return _echo_assemble(spine, counts, flag_threshold)


def transcript_spin_runs(
    df: DataFrame, min_run: int = 2, text_col: str = "text"
) -> DataFrame:
    """Agent-loop ("spin") detection — the trace pathology where an agent
    re-issues the same tool call and gets the same result back, burning
    turns without progress.  A turn is CYCLIC when its normalized text
    equals the previous turn's (period-1: verbatim retry storms) OR the
    one before that (period-2: the call/result ping-pong a stuck agent
    produces, where the repeat alternates between two texts).  Maximal
    runs of consecutive cyclic turns with length ≥ ``min_run`` are spin
    episodes; empty/NULL turns are never cyclic (nothing is looping).

    Returns one row per conv_id: ``n_spin_runs`` (episodes ≥ min_run),
    ``max_spin_run`` (longest cyclic run, 0 if none), ``spin_turns``
    (turns inside qualifying episodes — the rows a curation pass would
    mask or drop), ``is_spinning``.

    Text equality compares md5 digests of the normalized turn text, so
    the conv_id window moves 32-char digests, never transcripts; the
    lag/lag2 probes, the island grouping, and both aggregations all
    share ONE conv_id exchange (per-conversation state bounded by the
    conversation's own turn count, the extraction pipeline's scale
    contract).  Windows break turn_idx ties (retry storms duplicate
    indices) on the digest, so the output is a deterministic function
    of the input multiset."""
    w = W.partitionBy("conv_id").orderBy("turn_idx", "_k")
    key = F.md5(norm_key_col(F.coalesce(F.col(text_col), F.lit(""))))
    empty = F.trim(F.coalesce(F.col(text_col), F.lit(""))) == ""
    keyed = df.select(
        "conv_id", "turn_idx", key.alias("_k"), empty.alias("_e")
    )
    cyc = (
        (F.col("_k") == F.lag("_k", 1).over(w))
        | (F.col("_k") == F.lag("_k", 2).over(w))
    ) & ~F.col("_e")
    flagged = keyed.select(
        "conv_id",
        "turn_idx",
        "_k",
        F.coalesce(cyc, F.lit(False)).alias("_cyc"),
    )
    # island grouping: new group whenever the cyclic flag changes
    # (staged — the change flag is itself a lag, and Spark rejects a
    # window expression nested inside another window aggregate)
    stamped = flagged.select(
        "conv_id",
        "turn_idx",
        "_k",
        "_cyc",
        F.when(
            F.lag("_cyc").over(w).isNull()
            | (F.col("_cyc") != F.lag("_cyc").over(w)),
            1,
        )
        .otherwise(0)
        .alias("_chg"),
    )
    grouped = stamped.select(
        "conv_id",
        "_cyc",
        F.sum("_chg")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("_grp"),
    )
    runs = (
        grouped.filter(F.col("_cyc"))
        .groupBy("conv_id", "_grp")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    per_conv = runs.groupBy("conv_id").agg(
        F.sum(F.when(F.col("_len") >= min_run, 1).otherwise(0))
        .cast("long")
        .alias("n_spin_runs"),
        F.max("_len").cast("long").alias("max_spin_run"),
        F.sum(F.when(F.col("_len") >= min_run, F.col("_len")).otherwise(0))
        .cast("long")
        .alias("spin_turns"),
    )
    convs = df.select("conv_id").distinct()
    return convs.join(per_conv, "conv_id", "left").select(
        "conv_id",
        F.coalesce("n_spin_runs", F.lit(0)).alias("n_spin_runs"),
        F.coalesce("max_spin_run", F.lit(0)).alias("max_spin_run"),
        F.coalesce("spin_turns", F.lit(0)).alias("spin_turns"),
        (F.coalesce("n_spin_runs", F.lit(0)) > 0).alias("is_spinning"),
    )


def transcript_truncation_audit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Conversation-ending audit — the gate that keeps ABANDONED or
    CUT-OFF sessions out of an SFT corpus: a conversation whose final
    turn is a user message has no target to train on, and a final
    assistant turn that stops without terminal punctuation is the
    classic mid-generation kill (client disconnect, token-limit cut).

    One row per conv_id: ``n_turns``, ``last_turn_idx``, ``last_role``,
    ``ends_with_user``, ``last_turn_empty``, and ``ends_midsentence``
    (final normalized text is non-empty and does not end in one of
    ``. ! ? … " ' ) ] `` — the terminal-punctuation class).

    W1 best-per-group shape: one conv_id window picks the max-turn row
    while the count aggregates over the same exchange; only the final
    turn's text is inspected, and nothing corpus-sized re-shuffles.
    turn_idx ties break on (role, normalized text) so duplicated
    indices still yield a deterministic final-turn pick."""
    norm = F.trim(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")
    )
    pre = df.select("conv_id", "turn_idx", "role", norm.alias("_t"))
    w = W.partitionBy("conv_id").orderBy(
        F.col("turn_idx").desc(), F.col("role").desc(), F.col("_t").desc()
    )
    ranked = pre.select(
        "conv_id",
        "turn_idx",
        "role",
        "_t",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            W.partitionBy("conv_id").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_turns"),
    )
    last = ranked.filter(F.col("_rn") == 1)
    terminal = F.col("_t").rlike("[.!?…\"')\\]]$")
    return last.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("turn_idx").alias("last_turn_idx"),
        F.col("role").alias("last_role"),
        (F.col("role") == "user").alias("ends_with_user"),
        (F.col("_t") == "").alias("last_turn_empty"),
        ((F.col("_t") != "") & ~terminal).alias("ends_midsentence"),
    )


def transcript_tail_trim(
    df: DataFrame, budget: int = 256, text_col: str = "text"
) -> DataFrame:
    """Context-window tail trim — keep the longest SUFFIX of each
    conversation that fits a token budget, cutting only at turn
    boundaries (the standard "fit chat history into the model's
    context" preparation before SFT rendering or inference replay).
    The FINAL turn always survives even if it alone exceeds the budget
    (a sample with no final turn is no sample at all); earlier turns
    survive while the running suffix total stays ≤ ``budget``.

    Returns every turn: (conv_id, turn_idx, role, tokens,
    suffix_tokens, kept) where ``suffix_tokens`` is the whitespace-token
    total of this turn plus everything after it in the conversation —
    so ``kept = (suffix_tokens <= budget) OR last turn`` and the
    per-conversation drop count is auditable downstream.

    One conv_id window in DESCENDING turn order computes the reverse
    cumulative sum; tokens ride as a long per turn, so the shuffle
    carries (conv_id, turn_idx, role, tokens) and the text column never
    leaves the scan.  turn_idx ties break on (role, tokens): any
    remaining tie is between indistinguishable rows, so the output
    multiset stays deterministic."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    w = W.partitionBy("conv_id").orderBy(
        F.col("turn_idx").desc(), F.col("role").desc(), F.col("tokens").desc()
    )
    base = df.select(
        "conv_id", "turn_idx", "role", toks.alias("tokens")
    )
    ranked = base.select(
        "conv_id",
        "turn_idx",
        "role",
        "tokens",
        F.sum("tokens")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("suffix_tokens"),
        F.row_number().over(w).alias("_rn"),
    )
    return ranked.select(
        "conv_id",
        "turn_idx",
        "role",
        "tokens",
        "suffix_tokens",
        (
            (F.col("suffix_tokens") <= budget) | (F.col("_rn") == 1)
        ).alias("kept"),
    )


def transcript_pathology_facts(
    df: DataFrame,
    min_run: int = 2,
    budget: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """FUSED agent-trace pathology pass — the `transcript_conv_facts`
    trick applied to the pathology gates: spin-run statistics
    (`transcript_spin_runs`), session-ending flags
    (`transcript_truncation_audit`), and context-budget fit
    (`transcript_tail_trim`'s kept-turn count) in ONE conv_id exchange,
    where running the three a-la-carte operators pays three.

    Everything rides scan-side before the shuffle: the normalized-text
    md5 digest (spin equality), empty/terminal-punctuation booleans
    (truncation), and the whitespace token count (budget) — the turn
    text itself never shuffles.  After the one exchange: the asc
    lag/island window chain stamps cyclic runs; a (conv_id, run) window
    reuses the same partitioning for run lengths (grouping keys are a
    superset of the partition key, so Catalyst inserts sorts, not
    exchanges); a desc window ranks the final turn and accumulates the
    suffix-token cumsum; ONE final aggregation emits the facts row.

    Per conv_id: ``n_turns``, ``total_tokens``, spin facts
    (``n_spin_runs``/``max_spin_run``/``spin_turns``/``is_spinning``),
    ending facts (``last_role``/``ends_with_user``/``last_turn_empty``/
    ``ends_midsentence``), and ``kept_turns_budget`` — turns surviving
    the longest-suffix-under-``budget`` trim (final turn always kept).

    Tie-breaks: both window orders break duplicated turn_idx on (role,
    digest), so the output is a deterministic function of the input
    multiset (the standalone trim's tokens tie-break is replaced by the
    digest — only visibly different for rows duplicated in everything
    but tokens)."""
    key = F.md5(norm_key_col(F.coalesce(F.col(text_col), F.lit(""))))
    norm = F.trim(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")
    )
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )
    scan = df.select(
        "conv_id",
        "turn_idx",
        "role",
        key.alias("_k"),
        (norm == "").alias("_empty"),
        norm.rlike("[.!?…\"')\\]]$").alias("_term"),
        toks.alias("_tok"),
    )
    asc = W.partitionBy("conv_id").orderBy("turn_idx", F.col("role"), "_k")
    desc = W.partitionBy("conv_id").orderBy(
        F.col("turn_idx").desc(), F.col("role").desc(), F.col("_k").desc()
    )
    cyc = (
        (F.col("_k") == F.lag("_k", 1).over(asc))
        | (F.col("_k") == F.lag("_k", 2).over(asc))
    ) & ~F.col("_empty")
    s1 = scan.select(
        "*",
        F.coalesce(cyc, F.lit(False)).alias("_cyc"),
        F.row_number().over(desc).alias("_rnd"),
        F.sum("_tok")
        .over(desc.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("_suffix"),
    )
    s2 = s1.select(
        "*",
        F.when(
            F.lag("_cyc").over(asc).isNull()
            | (F.col("_cyc") != F.lag("_cyc").over(asc)),
            1,
        )
        .otherwise(0)
        .alias("_chg"),
    )
    s3 = s2.select(
        "*",
        F.sum("_chg")
        .over(asc.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("_grp"),
    )
    grpw = W.partitionBy("conv_id", "_grp")
    s4 = s3.select(
        "*",
        F.count(F.lit(1))
        .over(grpw.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("_len"),
        F.row_number()
        .over(grpw.orderBy("turn_idx", F.col("role"), "_k"))
        .alias("_rig"),
    )
    qual = F.col("_cyc") & (F.col("_len") >= min_run)
    last = lambda c: F.max(F.when(F.col("_rnd") == 1, c))  # noqa: E731
    return s4.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_tok").alias("total_tokens"),
        F.sum(F.when(qual & (F.col("_rig") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_spin_runs"),
        F.coalesce(
            F.max(F.when(F.col("_cyc"), F.col("_len"))), F.lit(0)
        )
        .cast("long")
        .alias("max_spin_run"),
        F.sum(F.when(qual, 1).otherwise(0)).cast("long").alias("spin_turns"),
        (F.sum(F.when(qual & (F.col("_rig") == 1), 1).otherwise(0)) > 0).alias(
            "is_spinning"
        ),
        last(F.col("role")).alias("last_role"),
        last(F.col("role") == "user").alias("ends_with_user"),
        last(F.col("_empty")).alias("last_turn_empty"),
        last(~F.col("_empty") & ~F.col("_term")).alias("ends_midsentence"),
        F.sum(
            F.when(
                (F.col("_suffix") <= budget) | (F.col("_rnd") == 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("kept_turns_budget"),
    )


def pathology_facts_append(
    facts: DataFrame,
    hist_turns: DataFrame,
    batch_turns: DataFrame,
    min_run: int = 2,
    budget: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Incremental maintenance for `transcript_pathology_facts` — the
    fact table an agent warehouse keeps per conversation, updated as new
    turns stream in, EXACTLY equal to a one-shot rebuild over
    history ∪ batch.

    Pathology facts are NOT lattice-mergeable (a batch turn can extend a
    spin run that started in history, flip the final-turn flags, and
    shift the suffix-budget window), so the merge recomputes — but ONLY
    for TOUCHED conversations: the batch's distinct conv_ids select
    their history turns (broadcast semi join — a micro-batch touches few
    conversations), the fused single-exchange pass runs over
    history∩touched ∪ batch, and untouched fact rows carry over via a
    broadcast anti join.  Cost per batch is O(touched conversations'
    turns + |facts|), never O(history).

    Returns the merged fact table (same schema as
    `transcript_pathology_facts`)."""
    touched = batch_turns.select("conv_id").distinct()
    relevant = hist_turns.join(
        F.broadcast(touched), "conv_id", "left_semi"
    ).unionByName(batch_turns)
    fresh = transcript_pathology_facts(
        relevant, min_run=min_run, budget=budget, text_col=text_col
    )
    kept = facts.join(F.broadcast(touched), "conv_id", "left_anti")
    return kept.unionByName(fresh)


def transcript_retry_collapse(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Latest-wins turn versioning: retry storms and ingest
    double-writes leave several rows per (conv_id, turn_idx) — the
    class `transcript_integrity` AUDITS; this operator RESOLVES it,
    keeping exactly one version per logical turn (the turn analog of
    `urls.url_dedup`'s latest-fetch-wins crawl rule).

    Pick: greatest ``ts`` (NULL ts coalesces to epoch — a timestamped
    version always beats an untimestamped one), ties broken by content
    fingerprint, then role / NULL-presence flags, so the winner is a
    total deterministic order both engines replay.  The raw payload
    (role, text, tool) rides the comparator struct BEHIND fields that
    fully determine it (md5 + is-null flags), so it never influences
    the comparison.

    ONE map-side-combinable max(struct) aggregate on (conv_id,
    turn_idx) — no window, no second pass over the corpus; clean
    conversations (the overwhelming mass) collapse map-side to
    themselves.  Returns (conv_id, turn_idx, role, text, tool,
    n_versions)."""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    tfp = F.md5(F.coalesce(F.col("tool"), F.lit("")))
    cand = F.struct(
        F.coalesce(
            F.col("ts"), F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        ).alias("t"),
        fp.alias("fp"),
        F.col(text_col).isNotNull().alias("nt"),
        F.coalesce(F.col("role"), F.lit("")).alias("role_c"),
        F.col("role").isNotNull().alias("nr"),
        tfp.alias("tfp"),
        F.col("tool").isNotNull().alias("ntool"),
        F.col("role").alias("role"),
        F.col(text_col).alias("text"),
        F.col("tool").alias("tool"),
    )
    return (
        df.groupBy("conv_id", "turn_idx")
        .agg(
            F.max(cand).alias("b"),
            F.count(F.lit(1)).alias("n_versions"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("b").getField("role").alias("role"),
            F.col("b").getField("text").alias("text"),
            F.col("b").getField("tool").alias("tool"),
            "n_versions",
        )
    )

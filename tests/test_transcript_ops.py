"""Transcript-curation operator semantics (operators/transcript_qc):
edge cases the sf-fixture oracles can't exercise — empty/NULL turns,
short conversations, tie-breaks, run shapes, partition invariance."""

from mistral_ocr_pipeline_spark.operators.transcript_qc import (
    conversation_texts,
    transcript_context_windows,
    transcript_loss_mask,
    transcript_prefix_dedup,
    transcript_refusal_flags,
    transcript_role_transitions,
    transcript_tool_stats,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


class TestPrefixDedup:
    def test_longest_branch_canonical(self, spark):
        rows = []
        # full session: 6 turns
        for i in range(6):
            rows.append(("a", i, "user", f"turn {i}", None, None))
        # retry branch: same first 3 turns, divergent turn 3, truncated
        for i in range(4):
            t = f"turn {i}" if i < 3 else "regenerated"
            rows.append(("b", i, "user", t, None, None))
        out = {r.conv_id: r for r in transcript_prefix_dedup(_df(spark, rows), k=3).collect()}
        assert out["a"].prefix_fp == out["b"].prefix_fp
        assert out["a"].group_size == 2 and out["b"].group_size == 2
        assert out["a"].is_canonical and not out["b"].is_canonical

    def test_tie_breaks_to_min_conv_id(self, spark):
        rows = [
            (c, i, "user", f"turn {i}", None, None)
            for c in ("x", "y")
            for i in range(5)
        ]
        out = {r.conv_id: r for r in transcript_prefix_dedup(_df(spark, rows), k=3).collect()}
        assert out["x"].is_canonical and not out["y"].is_canonical

    def test_short_conv_is_own_class(self, spark):
        rows = [("long", i, "user", f"turn {i}", None, None) for i in range(5)]
        rows += [("stub", i, "user", f"turn {i}", None, None) for i in range(2)]
        out = {r.conv_id: r for r in transcript_prefix_dedup(_df(spark, rows), k=3).collect()}
        # the 2-turn stub's prefix is all of it — it never merges with
        # the 5-turn session whose 3-turn prefix is longer
        assert out["long"].prefix_fp != out["stub"].prefix_fp
        assert out["long"].is_canonical and out["stub"].is_canonical

    def test_null_text_and_partition_invariance(self, spark):
        rows = [
            ("a", 0, "user", None, None, None),
            ("a", 1, "user", "x", None, None),
            ("b", 0, "user", "", None, None),
            ("b", 1, "user", "x", None, None),
        ]
        d = _df(spark, rows)
        a = sorted(map(tuple, transcript_prefix_dedup(d, k=3).collect()))
        b = sorted(map(tuple, transcript_prefix_dedup(d.repartition(7), k=3).collect()))
        assert a == b
        # NULL and '' normalize to the same key → the two convs merge
        fps = {t[1] for t in a}
        assert len(fps) == 1


class TestLossMask:
    def test_counts(self, spark):
        rows = [
            ("c", 0, "user", "one two three", None, None),
            ("c", 1, "assistant", "four five", None, None),
            ("c", 2, "tool", "ignored output", None, None),
            ("c", 3, "assistant", "", None, None),
            ("c", 4, "assistant", None, None, None),
        ]
        r = transcript_loss_mask(_df(spark, rows)).collect()[0]
        assert r.n_turns == 5
        assert r.n_trainable_turns == 3
        assert r.tokens_total == 7
        assert r.tokens_trainable == 2
        assert abs(r.trainable_ratio_r6 - round(2 / 7, 6)) < 1e-9

    def test_all_empty_conv_ratio_zero(self, spark):
        rows = [("c", 0, "user", "", None, None), ("c", 1, "assistant", "", None, None)]
        r = transcript_loss_mask(_df(spark, rows)).collect()[0]
        assert r.tokens_total == 0 and r.trainable_ratio_r6 == 0.0


class TestContextWindows:
    def test_turn_preserving_cut(self, spark):
        rows = [
            ("c", i, "user", " ".join(["w"] * 3), None, None) for i in range(5)
        ]
        out = {r.turn_idx: r for r in transcript_context_windows(_df(spark, rows), budget=5).collect()}
        # offsets 0,3,6,9,12 → windows 0,0,1,1,2
        assert [out[i].start_offset for i in range(5)] == [0, 3, 6, 9, 12]
        assert [out[i].win_id for i in range(5)] == [0, 0, 1, 1, 2]

    def test_single_turn_overflow_allowed(self, spark):
        rows = [("c", 0, "user", " ".join(["w"] * 99), None, None)]
        r = transcript_context_windows(_df(spark, rows), budget=5).collect()[0]
        assert r.win_id == 0 and r.turn_tokens == 99


class TestRoleTransitions:
    def test_matrix(self, spark):
        rows = [
            ("c", 0, "user", "a", None, None),
            ("c", 1, "assistant", "b", None, None),
            ("c", 2, "user", "c", None, None),
            ("d", 0, "user", "e", None, None),
            ("d", 1, "user", "f", None, None),
        ]
        m = {
            (r.from_role, r.to_role): r.n
            for r in transcript_role_transitions(_df(spark, rows)).collect()
        }
        assert m == {
            ("user", "assistant"): 1,
            ("assistant", "user"): 1,
            ("user", "user"): 1,
        }


class TestToolStats:
    def test_runs_and_errors(self, spark):
        rows = [
            ("c", 0, "user", "q", None, None),
            ("c", 1, "tool", "ok", "search", None),
            ("c", 2, "tool", "ERROR: timeout", "search", None),
            ("c", 3, "tool", "ok", "fetch", None),
            ("c", 4, "assistant", "a", None, None),
            ("c", 5, "tool", "ok", "fetch", None),
            ("d", 0, "user", "no tools here", None, None),
        ]
        out = {r.conv_id: r for r in transcript_tool_stats(_df(spark, rows)).collect()}
        c = out["c"]
        assert c.n_tool_turns == 4
        assert c.n_distinct_tools == 2
        assert c.n_tool_errors == 1
        assert c.max_tool_run == 3
        d = out["d"]
        assert (d.n_tool_turns, d.n_distinct_tools, d.max_tool_run) == (0, 0, 0)


class TestRefusalFlags:
    def test_gate(self, spark):
        rows = [
            ("good", 0, "user", "hi", None, None),
            ("good", 1, "assistant", "Sure, here is the answer.", None, None),
            ("refuse", 0, "user", "hi", None, None),
            ("refuse", 1, "assistant", "I'm sorry, I CANNOT do that.", None, None),
            ("empty", 0, "user", "hi", None, None),
            ("empty", 1, "assistant", "   ", None, None),
            ("noasst", 0, "user", "hi", None, None),
        ]
        out = {r.conv_id: r for r in transcript_refusal_flags(_df(spark, rows)).collect()}
        assert out["good"].keep
        assert not out["refuse"].keep and out["refuse"].n_refusals == 1
        assert not out["empty"].keep and out["empty"].n_empty_assistant == 1
        assert not out["noasst"].keep and out["noasst"].n_assistant == 0


class TestConversationTexts:
    def test_stable_order_and_null(self, spark):
        rows = [
            ("c", 1, "assistant", "world", None, None),
            ("c", 0, "user", "hello", None, None),
            ("c", 2, "user", None, None, None),
        ]
        r = conversation_texts(_df(spark, rows)).collect()[0]
        assert r.conv_text == "hello world "
        d = _df(spark, rows)
        assert (
            conversation_texts(d.repartition(5)).collect()[0].conv_text
            == r.conv_text
        )


class TestPreferencePairs:
    def test_pairs_from_branches(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_preference_pairs,
        )

        rows = []
        for i in range(6):
            rows.append(("a", i, "user", f"turn {i}", None, None))
        for i in range(5):
            t = f"turn {i}" if i < 3 else f"retry {i}"
            rows.append(("b", i, "user", t, None, None))
        # a second retry whose turn 3 matches the canonical -> filtered
        for i in range(4):
            rows.append(("c", i, "user", f"turn {i}", None, None))
        out = transcript_preference_pairs(_df(spark, rows), k=3).collect()
        assert len(out) == 1
        p = out[0]
        assert p.chosen_conv == "a" and p.rejected_conv == "b"
        assert p.prompt_text == "turn 0\nturn 1\nturn 2"
        assert p.chosen_text == "turn 3" and p.rejected_text == "retry 3"

    def test_no_pair_when_family_is_prefix_only(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_preference_pairs,
        )

        rows = [
            (c, i, "user", f"turn {i}", None, None)
            for c in ("a", "b")
            for i in range(3)
        ]
        assert transcript_preference_pairs(_df(spark, rows), k=3).count() == 0


class TestLatencyStats:
    def test_latency(self, spark):
        import datetime as dt

        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_latency_stats,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("c", 0, "user", "q", None, t0),
            ("c", 1, "assistant", "a", None, t0 + dt.timedelta(seconds=4)),
            ("c", 2, "user", "q2", None, t0 + dt.timedelta(seconds=10)),
            ("c", 3, "assistant", "a2", None, t0 + dt.timedelta(seconds=20)),
            ("d", 0, "assistant", "opener", None, t0),
        ]
        out = {r.conv_id: r for r in transcript_latency_stats(_df(spark, rows)).collect()}
        c = out["c"]
        assert c.n_replies == 2
        assert abs(c.mean_latency_r6 - 7.0) < 1e-9
        assert c.max_latency_s == 10.0
        # a conversation-opening assistant turn has no predecessor
        d = out["d"]
        assert d.n_replies == 0 and d.mean_latency_r6 is None


class TestConvFactsFusion:
    def test_matches_a_la_carte(self, spark):
        import datetime as dt

        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_conv_facts,
            transcript_fingerprint,
            transcript_integrity,
            transcript_loss_mask,
            transcript_refusal_flags,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", 0, "user", "hello there", None, t0),
            ("a", 1, "assistant", "I cannot do that", None, t0 + dt.timedelta(seconds=5)),
            ("a", 1, "assistant", "dup idx", None, t0 + dt.timedelta(seconds=3)),
            ("a", 3, "user", None, None, t0 + dt.timedelta(seconds=1)),
            ("b", 0, "assistant", "fine answer", None, t0),
            ("b", 1, "assistant", "", None, t0),
        ]
        d = _df(spark, rows)
        fused = {r.conv_id: r for r in transcript_conv_facts(d).collect()}
        integ = {r.conv_id: r for r in transcript_integrity(d).collect()}
        ref = {r.conv_id: r for r in transcript_refusal_flags(d).collect()}
        lm = {r.conv_id: r for r in transcript_loss_mask(d).collect()}
        fp = {r.conv_id: r for r in transcript_fingerprint(d).collect()}
        for c in ("a", "b"):
            f = fused[c]
            i = integ[c]
            assert (f.n_turns, f.dup_turns, f.has_gaps, f.starts_at_zero,
                    f.role_repeats, f.ts_inversions) == (
                i.n_turns, i.dup_turns, i.has_gaps, i.starts_at_zero,
                i.role_repeats, i.ts_inversions)
            r = ref[c]
            assert (f.n_assistant, f.n_refusals, f.n_empty_assistant) == (
                r.n_assistant, r.n_refusals, r.n_empty_assistant)
            m = lm[c]
            assert (f.tokens_total, f.tokens_trainable,
                    f.trainable_ratio_r6) == (
                m.tokens_total, m.tokens_trainable, m.trainable_ratio_r6)
            assert f.fingerprint == fp[c].fingerprint


class TestTemplateLint:
    def test_rules(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_template_lint,
        )

        rows = [
            # conforming: system, user, assistant, tool, tool, user
            ("ok", 0, "system", "s", None, None),
            ("ok", 1, "user", "q", None, None),
            ("ok", 2, "assistant", "a", None, None),
            ("ok", 3, "tool", "r1", None, None),
            ("ok", 4, "tool", "r2", None, None),
            ("ok", 5, "user", "q2", None, None),
            # orphan tool: tool right after user
            ("orphan", 0, "user", "q", None, None),
            ("orphan", 1, "tool", "r", None, None),
            # late system + broken alternation (user,user)
            ("bad", 0, "user", "q", None, None),
            ("bad", 1, "system", "s", None, None),
            ("bad", 2, "user", "q2", None, None),
            # opens with assistant
            ("opener", 0, "assistant", "a", None, None),
        ]
        out = {r.conv_id: r for r in transcript_template_lint(_df(spark, rows)).collect()}
        ok = out["ok"]
        assert ok.template_ok and ok.first_role == "system"
        assert (ok.n_late_system, ok.n_orphan_tools, ok.n_alt_violations) == (0, 0, 0)
        assert out["orphan"].n_orphan_tools == 1 and not out["orphan"].template_ok
        bad = out["bad"]
        # user,system,user: system is late; the two user turns are
        # ua-adjacent (system excused) -> one alternation violation
        assert bad.n_late_system == 1 and bad.n_alt_violations == 1
        assert not bad.template_ok
        assert out["opener"].first_role == "assistant" and not out["opener"].template_ok


class TestModelBasedInvariants:
    """Seeded random conversations checked against pure-Python models in
    ONE Spark job each (the UniMax model-test discipline)."""

    def _random_turns(self):
        import random

        rng = random.Random(20260819)
        rows = []
        for c in range(40):
            n = rng.randint(1, 12)
            start = rng.choice([0, 0, 0, 1])
            for i in range(n):
                idx = start + i + (rng.random() < 0.1)  # occasional gap
                words = rng.randint(0, 30)
                rows.append(
                    (
                        f"c{c:03d}",
                        int(idx),
                        rng.choice(["user", "assistant", "tool", "system"]),
                        " ".join(f"w{rng.randint(0, 50)}" for _ in range(words)),
                        None,
                        None,
                    )
                )
        return rows

    def test_context_windows_match_python_model(self, spark):
        rows = self._random_turns()
        # the operator's cumsum is deterministic only when turn_idx is
        # unique per conversation — dedupe the fixture like real input
        seen = set()
        uniq = []
        for r in rows:
            if (r[0], r[1]) not in seen:
                seen.add((r[0], r[1]))
                uniq.append(r)
        budget = 37
        got = {
            (r.conv_id, r.turn_idx): (r.start_offset, r.win_id)
            for r in transcript_context_windows(
                _df(spark, uniq), budget=budget
            ).collect()
        }
        by_conv = {}
        for conv, idx, _, text, _, _ in uniq:
            toks = len(text.split()) if text.strip() else 0
            by_conv.setdefault(conv, []).append((idx, toks))
        want = {}
        for conv, turns in by_conv.items():
            off = 0
            for idx, toks in sorted(turns):
                want[(conv, idx)] = (off, off // budget)
                off += toks
        assert got == want

    def test_prefix_dedup_matches_python_model(self, spark):
        import hashlib
        import re

        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_prefix_dedup,
        )

        rows = self._random_turns()
        k = 2

        def norm(t):
            t = re.sub(r"[^\w\s/\-]", "", (t or "").lower())
            return re.sub(r"\s+", " ", t).strip()

        by_conv = {}
        for conv, idx, _, text, _, _ in rows:
            by_conv.setdefault(conv, []).append((idx, norm(text)))
        fps = {}
        for conv, turns in by_conv.items():
            pre = [t for _, t in sorted(turns)[:k]]
            fps[conv] = hashlib.md5("\x1f".join(pre).encode()).hexdigest()
        groups = {}
        for conv, fp in fps.items():
            groups.setdefault(fp, []).append(conv)
        want_canon = {}
        for fp, convs in groups.items():
            best = min(convs, key=lambda c: (-len(by_conv[c]), c))
            for c in convs:
                want_canon[c] = (
                    fp,
                    len(by_conv[c]),
                    len(convs),
                    c == best,
                )
        got = {
            r.conv_id: (r.prefix_fp, r.n_turns, r.group_size, r.is_canonical)
            for r in transcript_prefix_dedup(_df(spark, rows), k=k).collect()
        }
        assert got == want_canon


class TestHotTurns:
    def test_flags(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_hot_turns,
        )

        rows = []
        for c in range(4):
            rows.append((f"c{c}", 0, "assistant", "How can I help?", None, None))
            rows.append((f"c{c}", 1, "user", f"unique question {c}", None, None))
            rows.append((f"c{c}", 2, "assistant", "", None, None))
        # same text twice INSIDE one conv only -> 1 distinct conv, not hot
        rows.append(("c0", 3, "user", "repeat me", None, None))
        rows.append(("c0", 4, "user", "repeat me", None, None))
        out = {
            (r.conv_id, r.turn_idx): r
            for r in transcript_hot_turns(_df(spark, rows), min_convs=3).collect()
        }
        assert all(out[(f"c{c}", 0)].is_hot for c in range(4))
        assert out[("c0", 0)].n_convs_sharing == 4
        assert not out[("c0", 1)].is_hot
        # empty turns share a digest across convs but are never hot
        assert out[("c1", 2)].n_convs_sharing == 4
        assert not out[("c1", 2)].is_hot
        assert not out[("c0", 3)].is_hot and out[("c0", 3)].n_convs_sharing == 1

    def test_normalization_groups(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_hot_turns,
        )

        rows = [
            ("a", 0, "user", "Hello, World!", None, None),
            ("b", 0, "user", "hello   world", None, None),
            ("c", 0, "user", "HELLO WORLD", None, None),
        ]
        out = transcript_hot_turns(_df(spark, rows), min_convs=3).collect()
        assert all(r.is_hot and r.n_convs_sharing == 3 for r in out)


class TestPreferencePairStats:
    def test_known_deltas(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            preference_pair_stats,
        )

        pairs = spark.createDataFrame(
            [
                ("f1", "a", "b", "p", "one two three", "one"),
                ("f2", "a", "b", "p", "one", "one two three"),
                ("f3", "a", "b", "p", "same len", "also len2"),
                ("f4", "a", "b", "p", "", "x"),
            ],
            "prefix_fp string, chosen_conv string, rejected_conv string, "
            "prompt_text string, chosen_text string, rejected_text string",
        )
        r = preference_pair_stats(pairs).collect()[0]
        assert r.n_pairs == 4
        # deltas: +2, -2, 0, -1 -> mean -0.25
        assert abs(r.mean_len_delta_r6 - (-0.25)) < 1e-9
        assert abs(r.frac_chosen_longer_r6 - 0.25) < 1e-9
        assert abs(r.frac_equal_len_r6 - 0.25) < 1e-9
        assert abs(r.mean_chosen_tokens_r6 - 1.5) < 1e-9
        assert abs(r.mean_rejected_tokens_r6 - 1.75) < 1e-9


class TestReviewRegressions:
    def test_preference_pairs_one_based_indices(self, spark):
        """Positional extraction: 1-based turn indices sharing turns 1-3
        and diverging at the 4th turn still pair correctly (index-valued
        turn_idx==k selection would pick inside the shared prefix)."""
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_preference_pairs,
        )

        rows = []
        for i in range(1, 7):
            rows.append(("a", i, "user", f"turn {i}" if i != 4 else "orig 4", None, None))
        for i in range(1, 5):
            rows.append(("b", i, "user", f"turn {i}" if i != 4 else "retry 4", None, None))
        out = transcript_preference_pairs(_df(spark, rows), k=3).collect()
        assert len(out) == 1
        p = out[0]
        assert p.chosen_text == "orig 4" and p.rejected_text == "retry 4"
        assert p.prompt_text == "turn 1\nturn 2\nturn 3"

    def test_context_windows_duplicate_turn_idx_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_context_windows,
        )

        rows = [
            ("c", 0, "user", "a b c", None, None),
            ("c", 1, "assistant", "d e", None, None),
            ("c", 1, "assistant", "f g h i", None, None),  # retry double-write
            ("c", 2, "user", "j", None, None),
        ]
        d = _df(spark, rows)
        a = sorted(map(tuple, transcript_context_windows(d, budget=4).collect()))
        for parts in (3, 7, 1):
            b = sorted(
                map(
                    tuple,
                    transcript_context_windows(
                        d.repartition(parts), budget=4
                    ).collect(),
                )
            )
            assert a == b
        # the two same-idx rows order by md5(text): offsets are a fixed
        # permutation, and the downstream turn (idx 2) sees the full sum
        by = {(r[0], r[1], r[3]): r[4] for r in a}
        assert by[("c", 2, 1)] == 9

    def test_conv_facts_assistant_semantics_fixed_roles(self, spark):
        """Widening trainable_roles must change ONLY the token columns —
        refusal/empty/assistant counts stay role='assistant'."""
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_conv_facts,
        )

        rows = [
            ("c", 0, "user", "hi", None, None),
            ("c", 1, "assistant", "clean answer", None, None),
            ("c", 2, "tool", "i cannot connect: socket error", None, None),
            ("c", 3, "tool", "", None, None),
        ]
        d = _df(spark, rows)
        wide = transcript_conv_facts(
            d, trainable_roles=("assistant", "tool")
        ).collect()[0]
        assert wide.n_assistant == 1
        assert wide.n_refusals == 0  # the tool error is not a refusal
        assert wide.n_empty_assistant == 0  # the empty TOOL turn
        assert wide.tokens_trainable == 2 + 5  # assistant + tool tokens


class TestTranscriptEcho:
    def _out(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import transcript_echo

        return {
            (r.conv_id, r.turn_idx): r
            for r in transcript_echo(_df(spark, rows), **kw).collect()
        }

    def test_verbatim_echo_and_fresh_reply(self, spark):
        prompt = "please summarize the quarterly revenue report for the board"
        rows = [
            ("a", 0, "user", prompt, None, None),
            # verbatim restatement: every 5-gram comes from the prompt
            ("a", 1, "assistant", prompt, None, None),
            # fresh reply: no 5-gram overlap with the prompt
            ("a", 2, "assistant", "revenue grew nine percent while costs fell sharply", None, None),
        ]
        out = self._out(spark, rows)
        assert out[("a", 1)].echo_fraction == 1.0 and out[("a", 1)].is_echo
        assert out[("a", 2)].echo_fraction == 0.0 and not out[("a", 2)].is_echo
        # user turns are not scored
        assert ("a", 0) not in out

    def test_later_user_turn_does_not_count(self, spark):
        text = "alpha beta gamma delta epsilon zeta"
        rows = [
            ("a", 0, "assistant", text, None, None),  # no earlier source
            ("a", 1, "user", text, None, None),       # same grams, but LATER
        ]
        out = self._out(spark, rows)
        assert out[("a", 0)].n_grams == 2  # 6 words -> 2 distinct 5-grams
        assert out[("a", 0)].n_echoed == 0 and not out[("a", 0)].is_echo

    def test_short_turn_survives_with_zero_grams(self, spark):
        rows = [
            ("a", 0, "user", "one two three four five six", None, None),
            ("a", 1, "assistant", "too short", None, None),
            ("a", 2, "assistant", None, None, None),
        ]
        out = self._out(spark, rows)
        assert out[("a", 1)].n_grams == 0 and out[("a", 1)].echo_fraction == 0.0
        assert not out[("a", 1)].is_echo
        assert out[("a", 2)].n_grams == 0  # NULL text survives

    def test_tool_role_counts_as_source_when_configured(self, spark):
        payload = "result rows forty two with status success and latency low"
        rows = [
            ("a", 0, "tool", payload, None, None),
            ("a", 1, "assistant", payload, None, None),
        ]
        with_tool = self._out(spark, rows, source_roles=("user", "tool"))
        assert with_tool[("a", 1)].echo_fraction == 1.0
        user_only = self._out(spark, rows, source_roles=("user",))
        assert user_only[("a", 1)].echo_fraction == 0.0

    def test_cross_conversation_never_matches(self, spark):
        text = "the same exact sentence appears in two conversations here"
        rows = [
            ("a", 0, "user", text, None, None),
            ("b", 1, "assistant", text, None, None),
        ]
        out = self._out(spark, rows)
        assert out[("b", 1)].n_echoed == 0

    def test_partial_echo_fraction(self, spark):
        # assistant = 6 fresh words + verbatim copy of the 6-word prompt:
        # prompt contributes its 2 grams + 5 boundary grams; of the 9
        # distinct grams, exactly the prompt's own 2 match
        prompt = "alpha beta gamma delta epsilon zeta"
        rows = [
            ("a", 0, "user", prompt, None, None),
            ("a", 1, "assistant", "one two three four five six " + prompt, None, None),
        ]
        out = self._out(spark, rows)
        r = out[("a", 1)]
        assert r.n_grams == 8 and r.n_echoed == 2
        assert abs(r.echo_fraction - 0.25) < 1e-9 and not r.is_echo


class TestEchoIncremental:
    PROMPT = "please summarize the quarterly revenue report for the board"
    FRESH = "revenue grew nine percent while costs fell sharply this year"

    def _oneshot(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import transcript_echo

        return {
            (r.conv_id, r.turn_idx): r
            for r in transcript_echo(_df(spark, rows), **kw).collect()
        }

    def _incremental(self, spark, hist, batch, **kw):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            build_echo_index,
            transcript_echo_incremental,
        )

        idx = build_echo_index(_df(spark, hist), **kw)
        return {
            (r.conv_id, r.turn_idx): r
            for r in transcript_echo_incremental(
                _df(spark, batch), idx, **kw
            ).collect()
        }

    def test_incremental_equals_oneshot_on_batch_rows(self, spark):
        hist = [
            ("a", 0, "user", self.PROMPT, None, None),
            ("a", 1, "assistant", self.FRESH, None, None),
            ("b", 0, "user", self.FRESH, None, None),
        ]
        batch = [
            # echoes a HISTORY user turn
            ("a", 2, "assistant", self.PROMPT, None, None),
            # echoes a BATCH user turn (index alone can't see it)
            ("b", 1, "user", self.PROMPT, None, None),
            ("b", 2, "assistant", self.PROMPT, None, None),
            # fresh
            ("a", 4, "assistant", "completely new words without any overlap here", None, None),
        ]
        inc = self._incremental(spark, hist, batch)
        full = self._oneshot(spark, hist + batch)
        assert set(inc) == {("a", 2), ("b", 2), ("a", 4)}
        for key, r in inc.items():
            f = full[key]
            assert (r.n_grams, r.n_echoed, r.echo_fraction, r.is_echo) == (
                f.n_grams, f.n_echoed, f.echo_fraction, f.is_echo
            ), key
        assert inc[("a", 2)].echo_fraction == 1.0
        assert inc[("b", 2)].echo_fraction == 1.0
        assert inc[("a", 4)].echo_fraction == 0.0

    def test_strictly_earlier_rule_survives_the_index(self, spark):
        # the source gram's first occurrence is the SAME turn index as the
        # assistant turn in another conversation slot — but within one conv,
        # a source at the same turn_idx must NOT count
        hist = [("a", 2, "user", self.PROMPT, None, None)]
        batch = [("a", 2, "assistant", self.PROMPT, None, None)]
        inc = self._incremental(spark, hist, batch)
        assert inc[("a", 2)].n_echoed == 0

    def test_append_equals_rebuild(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            build_echo_index,
            echo_index_append,
        )

        hist = [
            ("a", 0, "user", self.PROMPT, None, None),
            ("a", 4, "user", self.FRESH, None, None),
        ]
        batch = [
            # same gram as hist turn 0 but LATER -> min stays 0
            ("a", 6, "user", self.PROMPT, None, None),
            # same gram as hist turn 4 but EARLIER -> min moves to 2
            ("a", 2, "user", self.FRESH, None, None),
            # brand-new conv
            ("b", 1, "user", "six fresh words make one gram", None, None),
        ]
        appended = {
            (r.conv_id, r.g): r.first_turn
            for r in echo_index_append(
                build_echo_index(_df(spark, hist)), _df(spark, batch)
            ).collect()
        }
        rebuilt = {
            (r.conv_id, r.g): r.first_turn
            for r in build_echo_index(_df(spark, hist + batch)).collect()
        }
        assert appended == rebuilt
        assert min(appended[k] for k in appended if k[0] == "a") == 0
        assert any(v == 2 for k, v in appended.items() if k[0] == "a")


class TestScriptMismatch:
    """transcript_script_mismatch: assistant turns in a script no user
    turn used (full path value-oracled by the driver query)."""

    def test_mismatch_detection_and_neutral_cases(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_script_mismatch,
        )

        rows = [
            # conv a: user asks in Cyrillic, assistant answers Greek -> flag
            ("a", 0, "user", "привет как дела сегодня", None, None),
            ("a", 1, "assistant", "αλφα βητα γαμμα", None, None),
            # conv b: user Latin, assistant Latin -> clean
            ("b", 0, "user", "hello there friend", None, None),
            ("b", 1, "assistant", "general kenobi", None, None),
            # conv c: 'none' turns assert nothing; assistant matches user
            ("c", 0, "user", "мир труд май", None, None),
            ("c", 1, "assistant", "12345 .,!", None, None),   # none
            ("c", 2, "assistant", "да конечно хорошо", None, None),
            # conv d: NO scripted user turn -> 0 mismatches by definition
            ("d", 0, "user", "...", None, None),
            ("d", 1, "assistant", "latin answer here", None, None),
            # conv e: no assistant turns at all
            ("e", 0, "user", "question pending", None, None),
        ]
        out = {
            r.conv_id: r
            for r in transcript_script_mismatch(_df(spark, rows)).collect()
        }
        assert set(out) == {"a", "b", "c", "d", "e"}
        ra = out["a"]
        assert ra.script_mismatch and ra.n_mismatched_asst_turns == 1
        assert (ra.n_user_scripts, ra.n_asst_scripts) == (1, 1)
        assert not out["b"].script_mismatch
        rc = out["c"]
        assert not rc.script_mismatch and rc.n_asst_scripts == 1
        rd = out["d"]
        assert not rd.script_mismatch and rd.n_user_scripts == 0
        re_ = out["e"]
        assert not re_.script_mismatch and re_.n_asst_scripts == 0


class TestSpinRuns:
    def _out(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_spin_runs,
        )

        return {
            r.conv_id: r
            for r in transcript_spin_runs(_df(spark, rows), **kw).collect()
        }

    def test_period1_retry_storm(self, spark):
        rows = [("a", i, "tool", "same call", None, None) for i in range(4)]
        rows += [("a", 4, "assistant", "done", None, None)]
        out = self._out(spark, rows)
        # turns 1,2,3 are cyclic (lag1 match) → one run of 3
        a = out["a"]
        assert (a.n_spin_runs, a.max_spin_run, a.spin_turns, a.is_spinning) == (
            1, 3, 3, True,
        )

    def test_period2_ping_pong(self, spark):
        texts = ["call A", "result B", "call A", "result B", "call A"]
        rows = [("a", i, "assistant", t, None, None) for i, t in enumerate(texts)]
        out = self._out(spark, rows)
        # turns 2,3,4 match lag2 → run of 3
        a = out["a"]
        assert (a.n_spin_runs, a.max_spin_run, a.spin_turns) == (1, 3, 3)

    def test_clean_conversation_zero(self, spark):
        rows = [("a", i, "user", f"turn {i}", None, None) for i in range(6)]
        a = self._out(spark, rows)["a"]
        assert (a.n_spin_runs, a.max_spin_run, a.spin_turns, a.is_spinning) == (
            0, 0, 0, False,
        )

    def test_empty_turns_never_cycle(self, spark):
        rows = [("a", i, "tool", "", None, None) for i in range(5)]
        rows += [("b", 0, "tool", None, None, None), ("b", 1, "tool", None, None, None)]
        out = self._out(spark, rows)
        assert not out["a"].is_spinning and not out["b"].is_spinning

    def test_min_run_threshold_and_max_reporting(self, spark):
        # one cyclic turn only (run len 1): below min_run=2 — reported in
        # max_spin_run but not in n_spin_runs/spin_turns
        rows = [
            ("a", 0, "user", "x", None, None),
            ("a", 1, "user", "x", None, None),
            ("a", 2, "user", "y", None, None),
        ]
        a = self._out(spark, rows)["a"]
        # spin_turns counts only QUALIFYING episodes; max reports any run
        assert (a.n_spin_runs, a.max_spin_run, a.spin_turns, a.is_spinning) == (
            0, 1, 0, False,
        )

    def test_normalization_case_and_punct(self, spark):
        rows = [
            ("a", 0, "tool", "Retry: NOW!", None, None),
            ("a", 1, "tool", "retry now", None, None),
            ("a", 2, "tool", "RETRY   now", None, None),
        ]
        a = self._out(spark, rows)["a"]
        assert a.is_spinning and a.max_spin_run == 2


class TestTruncationAudit:
    def _out(self, spark, rows):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_truncation_audit,
        )

        return {
            r.conv_id: r
            for r in transcript_truncation_audit(_df(spark, rows)).collect()
        }

    def test_flags(self, spark):
        rows = [
            ("user_end", 0, "assistant", "Hello.", None, None),
            ("user_end", 1, "user", "And then?", None, None),
            ("cut", 0, "user", "Hi.", None, None),
            ("cut", 1, "assistant", "The answer is that we", None, None),
            ("clean", 0, "user", "Hi.", None, None),
            ("clean", 1, "assistant", "Done!", None, None),
            ("empty_end", 0, "user", "Hi.", None, None),
            ("empty_end", 1, "assistant", "   ", None, None),
        ]
        out = self._out(spark, rows)
        ue = out["user_end"]
        assert ue.ends_with_user and not ue.ends_midsentence and ue.n_turns == 2
        cut = out["cut"]
        assert cut.ends_midsentence and not cut.ends_with_user
        assert cut.last_role == "assistant" and cut.last_turn_idx == 1
        clean = out["clean"]
        assert not clean.ends_midsentence and not clean.last_turn_empty
        ee = out["empty_end"]
        assert ee.last_turn_empty and not ee.ends_midsentence

    def test_terminal_punctuation_classes(self, spark):
        enders = ['Yes.', 'Yes!', 'Maybe?', 'quote"', "quote'", "paren)", "bracket]"]
        rows = [(f"c{i}", 0, "assistant", t, None, None) for i, t in enumerate(enders)]
        rows.append(("mid", 0, "assistant", "ends with word", None, None))
        out = self._out(spark, rows)
        assert all(not out[f"c{i}"].ends_midsentence for i in range(len(enders)))
        assert out["mid"].ends_midsentence


class TestTailTrim:
    def _out(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_tail_trim,
        )

        return transcript_tail_trim(_df(spark, rows), **kw).collect()

    def test_suffix_cut_at_turn_boundary(self, spark):
        rows = [
            ("a", 0, "user", "one two three", None, None),      # 3 toks
            ("a", 1, "assistant", "four five", None, None),      # 2
            ("a", 2, "user", "six", None, None),                 # 1
        ]
        out = {r.turn_idx: r for r in self._out(spark, rows, budget=3)}
        # suffixes: turn2=1, turn1=3, turn0=6 → keep turns 1,2
        assert [out[i].kept for i in (0, 1, 2)] == [False, True, True]
        assert [out[i].suffix_tokens for i in (0, 1, 2)] == [6, 3, 1]

    def test_final_turn_always_survives(self, spark):
        rows = [
            ("a", 0, "user", "a b", None, None),
            ("a", 1, "assistant", "one two three four five six", None, None),
        ]
        out = {r.turn_idx: r for r in self._out(spark, rows, budget=4)}
        assert out[1].kept and not out[0].kept

    def test_empty_and_null_turns_cost_zero(self, spark):
        rows = [
            ("a", 0, "user", "w1 w2 w3 w4", None, None),
            ("a", 1, "tool", None, None, None),
            ("a", 2, "tool", "   ", None, None),
            ("a", 3, "assistant", "w5", None, None),
        ]
        out = {r.turn_idx: r for r in self._out(spark, rows, budget=5)}
        assert [out[i].tokens for i in range(4)] == [4, 0, 0, 1]
        assert all(out[i].kept for i in range(4))


class TestPathologyFacts:
    """`transcript_pathology_facts` must agree with the three standalone
    gates on every shared fact — the fused pass exists to pay ONE
    conv_id exchange, not to change semantics."""

    def _fixture(self, spark):
        rows = []
        texts = {0: "call x", 1: "call x", 2: "call x", 3: "done.", 4: "next"}
        for i in range(5):
            rows.append(("a", i, ["user", "assistant"][i % 2], texts[i], None, None))
        pp = ["PING", "PONG", "PING", "PONG", "PING", "end?"]
        for i, t in enumerate(pp):
            rows.append(("b", i, "tool", t, None, None))
        rows += [("c", 0, "user", "only turn no punct", None, None)]
        rows += [("d", 0, "assistant", "", None, None),
                 ("d", 1, "user", None, None, None)]
        rows += [("e", i, "user", f"w{i} " * (i + 1) * 30, None, None)
                 for i in range(5)]
        return _df(spark, rows)

    def test_agrees_with_standalone_gates(self, spark):
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_pathology_facts,
            transcript_spin_runs,
            transcript_tail_trim,
            transcript_truncation_audit,
        )

        df = self._fixture(spark)
        fused = {
            r.conv_id: r
            for r in transcript_pathology_facts(df, min_run=2, budget=100).collect()
        }
        spin = {r.conv_id: r for r in transcript_spin_runs(df, min_run=2).collect()}
        tr = {r.conv_id: r for r in transcript_truncation_audit(df).collect()}
        kept = {
            r.conv_id: r.k
            for r in transcript_tail_trim(df, budget=100)
            .filter("kept")
            .groupBy("conv_id")
            .agg(F.count("*").alias("k"))
            .collect()
        }
        assert set(fused) == set(spin) == set(tr)
        for c, f in fused.items():
            s = spin[c]
            assert (f.n_spin_runs, f.max_spin_run, f.spin_turns, f.is_spinning) == (
                s.n_spin_runs, s.max_spin_run, s.spin_turns, s.is_spinning,
            ), c
            t = tr[c]
            assert (f.last_role, f.ends_with_user, f.last_turn_empty,
                    f.ends_midsentence, f.n_turns) == (
                t.last_role, t.ends_with_user, t.last_turn_empty,
                t.ends_midsentence, t.n_turns,
            ), c
            assert f.kept_turns_budget == kept[c], c

    def test_single_exchange_no_python(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_pathology_facts,
        )

        out = transcript_pathology_facts(self._fixture(spark))
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert plan.count("Exchange") == 1, plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestPathologyAppend:
    def test_append_equals_rebuild_with_boundary_spin(self, spark):
        """A spin run that STARTS in history and is only completed by the
        batch must surface — touched conversations recompute over their
        full history, so the boundary is invisible."""
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            pathology_facts_append,
            transcript_pathology_facts,
        )

        rows = []
        # conv a: turns 0-4 in history, turns 5-6 arrive in the batch and
        # extend the "call x" run that history ended with
        hist_a = ["intro", "setup", "call x", "call x", "call x"]
        for i, t in enumerate(hist_a):
            rows.append(("a", i, "tool", t, None, None, False))
        rows += [("a", 5, "tool", "call x", None, None, True),
                 ("a", 6, "assistant", "done.", None, None, True)]
        # conv b: untouched by the batch — its fact row must carry over
        for i in range(4):
            rows.append(("b", i, "user", f"turn {i}", None, None, False))
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, in_batch boolean",
        )
        hist = df.filter("not in_batch").drop("in_batch")
        batch = df.filter("in_batch").drop("in_batch")
        full = df.drop("in_batch")
        facts = transcript_pathology_facts(hist)
        merged = sorted(
            map(tuple, pathology_facts_append(facts, hist, batch).collect())
        )
        rebuilt = sorted(
            map(tuple, transcript_pathology_facts(full).collect())
        )
        assert merged == rebuilt
        a = {r.conv_id: r for r in pathology_facts_append(facts, hist, batch).collect()}
        # the boundary-crossing run: 4 consecutive "call x" repeats →
        # cyclic turns 3,4,5 → one episode of 3
        assert a["a"].is_spinning and a["a"].max_spin_run == 3
        # history alone saw only the first 2 echoes
        h = {r.conv_id: r for r in facts.collect()}
        assert h["a"].max_spin_run == 2

    def test_untouched_rows_carry_over_verbatim(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            pathology_facts_append,
            transcript_pathology_facts,
        )

        rows = [("a", i, "user", f"a {i}", None, None) for i in range(3)]
        rows += [("b", i, "user", f"b {i}", None, None) for i in range(3)]
        df = _df(spark, rows)
        facts = transcript_pathology_facts(df)
        batch = _df(spark, [("a", 3, "assistant", "new turn.", None, None)])
        merged = {
            r.conv_id: r
            for r in pathology_facts_append(facts, df, batch).collect()
        }
        before = {r.conv_id: r for r in facts.collect()}
        assert tuple(merged["b"]) == tuple(before["b"])
        assert merged["a"].n_turns == 4 and before["a"].n_turns == 3


class TestRetryCollapse:
    def _collapse(self, spark, rows):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_retry_collapse,
        )

        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        return {
            (r.conv_id, r.turn_idx): r
            for r in transcript_retry_collapse(df).collect()
        }

    def test_latest_ts_wins_and_null_ts_loses(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        t1 = dt.datetime(2024, 1, 1, 0, 16, 40)
        out = self._collapse(
            spark,
            [
                ("c", 0, "user", "original", None, t0),
                ("c", 0, "user", "edited", None, t1),
                ("c", 1, "assistant", "timestamped", None, t0),
                ("c", 1, "assistant", "stale retry", None, None),
                ("c", 2, "tool", "clean", "payload", t0),
            ],
        )
        assert out[("c", 0)].text == "edited"
        assert out[("c", 0)].n_versions == 2
        assert out[("c", 1)].text == "timestamped"
        assert out[("c", 2)].text == "clean"
        assert out[("c", 2)].tool == "payload"
        assert out[("c", 2)].n_versions == 1

    def test_identical_duplicates_collapse_deterministically(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        out = self._collapse(
            spark,
            [
                ("c", 0, "user", "same", None, t0),
                ("c", 0, "user", "same", None, t0),
            ],
        )
        assert out[("c", 0)].text == "same"
        assert out[("c", 0)].n_versions == 2

    def test_ts_tie_breaks_by_content_fingerprint(self, spark):
        import hashlib, datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        texts = ["alpha", "beta"]
        want = max(texts, key=lambda s: hashlib.md5(s.encode()).hexdigest())
        out = self._collapse(
            spark,
            [("c", 0, "user", s, None, t0) for s in texts],
        )
        assert out[("c", 0)].text == want

    def test_no_window_single_exchange(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_retry_collapse,
        )

        df = spark.createDataFrame(
            [("c", 0, "user", "x", None, None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        plan = (
            transcript_retry_collapse(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan

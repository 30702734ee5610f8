"""The bench's driver-facing stdout line must stay under the driver's
stdout tail-capture window (BENCH_r03 postmortem: one oversized line →
"parsed": null and the round's numbers were lost)."""

import json

from bench import compact_summary


def _fake_full_out():
    # every query key bench.py can currently emit, with worst-case name widths
    queries = {
        k: 123.456
        for k in [
            "gen_transcripts",
            "build_turn_edges",
            "pagerank_transcripts",
            "pagerank_join_transcripts",
            "edges_ft_events",
            "scc_events",
            "bfs_events",
            "four_cycles_events",
            "line_dedup",
            "cc_events",
            "triangles_events",
            "minhash_dedup",
            "ngram_jaccard",
            "decontaminate",
            "pack_shards",
            "ann_topk",
            "ref_pairwise_corr_5000",
            "ref_allpairs_1168",
            "ref_ft_1168",
            "ref_ft_100k",
        ]
    }
    return {
        "value": 12345.678,
        "queries": queries,
        "sf": 0.1,
        "pagerank": {"edges_per_sec_per_core": 123456.7},
        "ref_comparison": {"pairwise_corr_pairs_per_sec": 12345678.9},
        # big blocks that must NOT leak into the summary
        "query_stats": {k: {"median": 1, "min": 1, "max": 1, "repeats": 3} for k in queries},
    }


def test_summary_line_is_compact_and_parseable():
    line = json.dumps(compact_summary(_fake_full_out()))
    assert len(line) < 1500, f"summary line too long: {len(line)} bytes"
    parsed = json.loads(line)
    assert parsed["value"] == 12345.678
    assert parsed["unit"] == "sec"
    assert "query_stats" not in parsed
    assert len(parsed["queries"]) == 20


def test_summary_has_driver_contract_fields():
    parsed = compact_summary(_fake_full_out())
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in parsed

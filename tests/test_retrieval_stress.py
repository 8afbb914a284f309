"""Crowded-map retrieval regression (round-3 verdict weakness 4): with all
256 production keyframe slots filled across 8 scenes x 2 texture families,
loop/reloc retrieval at the trained 8192-word vocabulary must stay sharp.

Measured round 4 (dev/bench_retrieval.py): precision@1 1.0, recall@5 1.0,
word-gate recall 1.0 (mean 3.2 candidates), 94.6% of words used, word-usage
entropy 12.34/12.92 bits. Floors are set below the measurement to catch
regressions, not to ratify it.
"""

import os

import pytest

from eao_fusion_tpu.mapping import vocabulary

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(vocabulary.DEFAULT_VOCAB_PATH),
                    reason="trained vocabulary not present")
def test_crowded_db_retrieval_floors():
    from tests.retrieval_harness import build_retrieval_db, measure_retrieval
    db = build_retrieval_db()
    assert db.bow_db.shape[0] == 256
    m = measure_retrieval(db)
    assert m["precision_at_1"] >= 0.90, m
    assert m["recall_at_5"] >= 0.95, m
    assert m["word_gate_recall"] >= 0.90, m
    # the vocabulary must not collapse onto few words on a crowded map
    assert m["words_used_frac"] >= 0.5, m
    assert m["word_usage_entropy_bits"] >= 0.8 * m["max_entropy_bits"], m

"""BPE merge training — hand-worked vector.

Corpus: "low"×3, "lower"×2, "newest"×1 (word frequencies via repeated
words in two docs). Worked by hand through the greedy recurrence:

round 1 pair counts: (l o)=5, (o w)=5, (w e)=3, (e r)=2, (n e)=1,
  (e w)=1, (e s)=1, (s t)=1 → tie 5/5 broken lexicographically:
  "l o" → "lo".
round 2: (lo w)=5 → "low".
round 3: (low e)=2 ties (e r)=2 → "e r" wins ('e' < 'l') → "er".
"""

from __future__ import annotations

from amazon_textract_enhancer_spark.operators.textstats import bpe_train_merges


def _docs(spark):
    return spark.createDataFrame(
        [("low low low lower", ), ("lower newest", )], "text string"
    )


def test_hand_worked_merge_sequence(spark):
    out = [tuple(r) for r in bpe_train_merges(_docs(spark), rounds=3).collect()]
    assert out == [
        (1, "l o", "lo", 5),
        (2, "lo w", "low", 5),
        (3, "e r", "er", 2),
    ]


def test_more_rounds_extend_prefix_deterministically(spark):
    """Rounds R and R+2 agree on the first R merges (the recurrence is
    a prefix-stable greedy sequence)."""
    three = [tuple(r) for r in bpe_train_merges(_docs(spark), rounds=3).collect()]
    five = [tuple(r) for r in bpe_train_merges(_docs(spark), rounds=5).collect()]
    assert five[:3] == three
    assert len(five) == 5

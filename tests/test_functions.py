"""Unit tests: tokenizer, tree parse, tag distance, hashing, analysis."""

import pytest

from ontonotes_5_parsing_ray.functions.analysis import (
    detect_language,
    n_tokens_sqlish,
    quality_metrics,
)
from ontonotes_5_parsing_ray.functions.distance import levenshtein
from ontonotes_5_parsing_ray.functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    rolling_fingerprint,
    simhash64,
    stable_hash64,
)
from ontonotes_5_parsing_ray.functions.tagdist import (
    build_reduction_rules,
    canonical_member,
    nearest_seed_index,
    tag_distance,
)
from ontonotes_5_parsing_ray.functions.text import (
    collapse_double_spaces,
    tokenize_any_text,
)
from ontonotes_5_parsing_ray.functions.treeparse import (
    parse_sexpr_tree,
    pos_tag,
    rule_parse,
    verb_lemma,
)


def test_levenshtein_basics():
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0


def test_tokenizer_cjk_split():
    assert tokenize_any_text("ab 你好 cd") == ["ab", "你", "好", "cd"]
    assert tokenize_any_text("Hello, world!") == ["Hello", ",", "world", "!"]
    assert tokenize_any_text("") == []


def test_whitespace_fixpoint():
    assert collapse_double_spaces("a    b  c ") == "a b c"


def test_parse_sexpr_real_tree():
    tree = "(TOP (S (NP-SBJ (NNP Hong) (NNP Kong)) (VP (VBZ is) (NP (DT a) (NN city)))))"
    out = parse_sexpr_tree(tree)
    assert out[0] == ("Hong", ["TOP", "S", "NP-SBJ", "NNP"])
    assert out[-1] == ("city", ["TOP", "S", "VP", "NP", "NN"])
    for bad in ["(TOP (S)", "TOP)", "(TOP (NP two words end))", "(())"]:
        with pytest.raises(ValueError):
            parse_sexpr_tree(bad)
    assert parse_sexpr_tree("   ") == []


def test_rule_parse_paths_and_lemmas():
    toks = ["Alice", "founded", "Acme", "in", "Paris", "."]
    parsed = rule_parse(toks)
    assert [p[1][-1] for p in parsed] == ["NNP", "VBD", "NNP", "IN", "NNP", "PUNCT"]
    assert parsed[3][1] == ["TOP", "S", "PP", "IN"]
    assert parsed[4][1] == ["TOP", "S", "PP", "NP", "NNP"]
    assert verb_lemma("founded") == "found"
    assert verb_lemma("acquired") == "acquire"
    assert pos_tag("他") == "FW"


def test_tag_distance_reference_semantics():
    assert tag_distance("NP", "NP") == 0
    assert tag_distance("NP", "NP-SBJ") == 2          # prefix
    assert tag_distance("NP-SBJ", "NP-OBJ") == levenshtein("SBJ", "OBJ") + 2
    assert tag_distance("...", "abc") == 6 * 10       # alpha vs non-alpha
    assert tag_distance("N.P", "N-P") == 1            # normalized-equal
    assert tag_distance("XX", "YY") == levenshtein("XX", "YY") * 10 + 2


def test_reduction_rules_shortest_lex_rep():
    rules, clusters = build_reduction_rules(
        {"NP": 100, "VP": 80, "NP-SBJ": 50, "NP-OBJ": 10, "VB": 5}, 3
    )
    assert rules["NP-OBJ"] == "NP"
    assert rules["VP"] == "VB"  # VB joins VP's cluster, rep = shortest/lex
    assert canonical_member(["ORG", "ORGANIZATION", "OR"]) == "OR"
    assert nearest_seed_index("NP-X", ["VP", "NP", "QQ"]) == 1


def test_minhash_estimates_jaccard():
    mh = MinHasher(128)
    a = char_shingles("acme corporation")
    b = char_shingles("acme corp")
    est = float((mh.signature(a) == mh.signature(b)).mean())
    true = jaccard(a, b)
    assert abs(est - true) < 0.25
    # determinism across instances
    assert (MinHasher(128).signature(a) == mh.signature(a)).all()


def test_simhash_similar_texts_close():
    a = simhash64("the quick brown fox jumps".split())
    b = simhash64("the quick brown fox jumped".split())
    c = simhash64("completely different words entirely".split())
    assert hamming64(a, b) < hamming64(a, c)


def test_stable_hash_and_fingerprint_deterministic():
    assert stable_hash64("x") == stable_hash64("x")
    assert rolling_fingerprint("some longer text for the window") == \
        rolling_fingerprint("some longer text for the window")
    assert rolling_fingerprint("") == 0


def test_analysis_sql_parity_shapes():
    assert n_tokens_sqlish("") == 1          # matches regexp_split_to_array('')
    assert n_tokens_sqlish("a  b   c") == 3
    m = quality_metrics("The 42 cats.")
    assert 0 <= m["alpha_ratio"] <= 1
    assert m["n_tokens"] == 3


def test_langid_heuristic():
    assert detect_language("the cat is on the mat and it is happy") == "en"
    assert detect_language("el perro y la casa de que es en madrid") == "es"
    assert detect_language("le chat est dans les maisons pour une nuit") == "fr"
    assert detect_language("der hund und die katze ist nicht hier") == "de"
    assert detect_language("你好世界这是一个测试") == "zh"
    assert detect_language("") == "und"
    assert detect_language("zzz qqq www") == "und"


def test_vectorized_partition_hash_deterministic():
    """partition_vec/hash64_vec: scalar twin agrees, values are frozen
    (cross-process / cross-run determinism — a silent change would scramble
    checkpoint partition layouts), int and str keys both supported."""
    import numpy as np

    from ontonotes_5_parsing_ray.functions.hashing import (
        hash64_vec,
        partition_vec,
    )
    from ontonotes_5_parsing_ray.state.checkpoint import partition_of

    keys = ["conv-0", "conv-123", "user_7", "", "ünïcode-Ω"]
    assert [int(h) for h in hash64_vec(keys)] == [
        17192976686313659930, 2039707704132810116, 2863543129529096168,
        1760245841805064774, 1342582833961847469,
    ]
    assert list(partition_vec(keys, 64)) == [26, 4, 40, 6, 45]
    assert [partition_of(k, 64) for k in keys] == [26, 4, 40, 6, 45]
    assert list(partition_vec([0, 1, 999999], 64)) == [0, 37, 21]
    assert partition_vec([], 8).dtype == np.int32
    assert len(hash64_vec([])) == 0
    # pandas Series input (the common map_batches shape)
    import pandas as pd

    assert list(partition_vec(pd.Series(keys), 64)) == [26, 4, 40, 6, 45]


def test_repetition_score_hand_cases():
    """max-2-gram occurrence fraction; <2 tokens -> -1 sentinel."""
    from ontonotes_5_parsing_ray.stages.textstats import repetition_score

    # "a b a b a" -> grams: ab, ba, ab, ba -> max 2 of 4
    assert repetition_score("a b a b a") == 0.5
    # all 3 grams distinct
    assert repetition_score("w x y z") == 1.0 / 3.0
    # degenerate full repetition
    assert repetition_score("q q q q") == 1.0
    assert repetition_score("one") == -1.0
    assert repetition_score("") == -1.0


def test_hll_sketch_accuracy_and_merge_laws():
    """HLL: estimate within 5% at several cardinalities; merge is
    commutative/idempotent and equals the sketch of the union."""
    import numpy as np

    from ontonotes_5_parsing_ray.functions.sketches import (
        hll_add, hll_estimate, hll_merge, hll_new,
    )

    for n in (50, 1_000, 20_000, 200_000):
        vals = np.arange(n, dtype=np.int64) * 7 + 13
        est = hll_estimate(hll_add(hll_new(), vals))
        assert abs(est - n) / n < 0.05, (n, est)

    a_vals = np.arange(0, 5_000, dtype=np.int64)
    b_vals = np.arange(2_500, 9_000, dtype=np.int64)
    a = hll_add(hll_new(), a_vals)
    b = hll_add(hll_new(), b_vals)
    ab, ba = hll_merge(a, b), hll_merge(b, a)
    assert (ab == ba).all()
    assert (hll_merge(ab, ab) == ab).all()          # idempotent
    union = hll_add(hll_new(), np.concatenate([a_vals, b_vals]))
    assert (ab == union).all()                      # merge == union sketch
    # split-into-batches == one pass (the distributed partials contract)
    split = hll_new()
    for chunk in np.array_split(a_vals, 7):
        hll_add(split, chunk)
    assert (split == a).all()


def test_bloom_filter_laws():
    """Bloom: zero false negatives always; FPR near theory; partials
    OR-merge to the same filter as a single pass (distributed contract);
    string and int keys both supported."""
    import numpy as np

    from ontonotes_5_parsing_ray.functions.sketches import (
        bloom_add, bloom_contains, bloom_new,
    )

    m_bits = 1 << 17
    present = np.arange(2_000, dtype=np.int64) * 3 + 1
    bits = bloom_add(bloom_new(m_bits), present)
    assert bloom_contains(bits, present).all()          # no false negatives
    absent = np.arange(1_000_000, 1_050_000, dtype=np.int64)
    fpr = float(bloom_contains(bits, absent).mean())
    # theory: (1 - e^(-kn/m))^k ~ 0.027 for k=7, n=2000, m=2^17
    assert fpr < 0.06, fpr

    split = bloom_new(m_bits)
    for chunk in np.array_split(present, 9):
        bloom_add(split, chunk)
    assert (split == bits).all()                        # merge == one pass

    sbits = bloom_add(bloom_new(m_bits), ["alpha", "beta"])
    assert bloom_contains(sbits, ["alpha", "beta"]).all()
    assert not bloom_contains(sbits, ["gamma-very-absent"]).any()


def test_cms_sketch_laws():
    """CMS: one-sided error (never undercounts); split partials sum to
    the one-pass sketch; absent keys near zero at low fill."""
    import numpy as np

    from ontonotes_5_parsing_ray.functions.sketches import (
        cms_add, cms_merge, cms_new, cms_query,
    )

    vals = np.array(["hot"] * 500 + ["warm"] * 80
                    + [f"t{i}" for i in range(3000)], dtype=object)
    one = cms_add(cms_new(), vals)
    est = cms_query(one, np.array(["hot", "warm", "t7", "absent"],
                                  dtype=object))
    assert est[0] >= 500 and est[1] >= 80 and est[2] >= 1
    assert est[0] <= 500 + 10 and est[3] <= 5   # low fill -> tiny overcount

    split = cms_new()
    for chunk in np.array_split(vals, 7):
        split = cms_merge(split, cms_add(cms_new(), chunk))
    assert (split == one).all()

"""Unit tests for the extraction rule-book (pure Python, no Ray)."""

from vectrain_ray import oracle, rules


def test_mentions_basic():
    ms = rules.extract_mentions("Alice Johnson works at Acme Corp")
    assert [m[0] for m in ms] == ["Alice Johnson", "Acme Corp"]
    # spans point at the surface
    s = "Alice Johnson works at Acme Corp"
    for surf, a, b in ms:
        assert s[a:b] == surf


def test_mentions_stopword_trim():
    ms = rules.extract_mentions("The Acme Corp hired Bob")
    assert ("Acme Corp" in [m[0] for m in ms])
    assert all(m[0] != "The Acme Corp" for m in ms)
    # lone stopword capitalized token is dropped
    assert rules.extract_mentions("The end") == []


def test_triples_basic():
    ts = rules.extract_triples_from_sentence("Alice Johnson works at Acme Corp")
    assert ts == [("Alice Johnson", "works_at", "Acme Corp")]


def test_triples_longest_predicate_wins():
    ts = rules.extract_triples_from_sentence("Bob worked at Globex")
    assert ts == [("Bob", "worked_at", "Globex")]


def test_triples_need_both_sides():
    assert rules.extract_triples_from_sentence("works at Acme Corp") == []
    assert rules.extract_triples_from_sentence("Alice works at") == []


def test_oracle_turn_multi_sentence():
    text = "Alice works at Acme Corp. Bob visited Paris."
    mentions, triples = oracle.extract_turn(text)
    surfs = [m[0] for m in mentions]
    assert surfs == ["Alice", "Acme Corp", "Bob", "Paris"]
    assert triples == [
        ("Alice", "works_at", "Acme Corp"),
        ("Bob", "visited", "Paris"),
    ]
    # mention spans index into the FULL text
    for surf, a, b in mentions:
        assert text[a:b] == surf


def test_stable_id_deterministic():
    assert rules.stable_id("a", 1, "x") == rules.stable_id("a", 1, "x")
    assert rules.stable_id("a", 1) != rules.stable_id("a", 2)
    assert len(rules.stable_id("z")) == 16


def test_normalize_and_merge_key():
    assert rules.normalize_surface("  Acme,  Corp! ") == "acme corp"
    assert rules.canonical_merge_key("acme corp") == "acme"
    assert rules.canonical_merge_key("acme inc") == "acme"
    assert rules.canonical_merge_key("inc") == "inc"  # all-suffix fallback

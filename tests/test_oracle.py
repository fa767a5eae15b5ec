"""Pure-Python oracle unit tests — pin every reference quirk.

Reference algorithm: /root/reference/src/ingest/youtube.py:111-164.
"""

from kgp.oracle import (
    Entry,
    extract_mentions,
    extracted_text_for_page,
    full_text,
    page_entries,
    segment_entries,
    triples_for_doc,
)


def E(start, dur, text):
    return Entry(start, dur, text)


class TestSegmentation:
    def test_leading_space_quirk(self):
        # current_segment_start=0.0, text="" → first append is " "+text
        segs = segment_entries([E(0.0, 5.0, "hello"), E(5.0, 5.0, "world")])
        assert len(segs) == 1
        assert segs[0].text == " hello world"
        assert segs[0].start == 0.0
        assert segs[0].end == 10.0  # last.start + last.duration

    def test_boundary_rule_closed_segment_ends_at_trigger_start(self):
        segs = segment_entries([E(0.0, 10.0, "a"), E(31.0, 4.0, "b")])
        assert len(segs) == 2
        assert segs[0].text == " a"
        assert (segs[0].start, segs[0].end) == (0.0, 31.0)
        assert segs[1].text == "b"  # new segment: no leading space
        assert (segs[1].start, segs[1].end) == (31.0, 35.0)

    def test_exact_boundary_is_new_segment(self):
        segs = segment_entries([E(0.0, 30.0, "a"), E(30.0, 1.0, "b")])
        assert len(segs) == 2

    def test_gap_over_window_no_empty_segment(self):
        # entries 70s apart: exactly two segments, no empty one between
        segs = segment_entries([E(0.0, 5.0, "a"), E(70.0, 5.0, "b")])
        assert [s.text for s in segs] == [" a", "b"]
        assert segs[0].end == 70.0

    def test_first_entry_after_boundary_no_leading_space(self):
        # first entry at 40s: if-branch fires with empty text → no save,
        # new segment anchored at 40 with text (no leading space)
        segs = segment_entries([E(40.0, 5.0, "a")])
        assert [s.text for s in segs] == ["a"]
        assert (segs[0].start, segs[0].end) == (40.0, 45.0)

    def test_whitespace_preserved_no_strip(self):
        segs = segment_entries([E(0.0, 5.0, " padded "), E(5.0, 5.0, "x ")])
        assert segs[0].text == "  padded  x "

    def test_empty_input(self):
        assert segment_entries([]) == []


class TestPageDerivation:
    def test_split_join_lossless(self):
        for text in ["a b c", " lead", "double  space", "", "   ", "one"]:
            toks = text.split(" ")
            assert " ".join(toks) == text

    def test_extracted_text_is_space_plus_text(self):
        # entries start at 0.0 → leading-space quirk applies end-to-end
        for text in ["hello world", " x  y", "w " * 200]:
            assert extracted_text_for_page(text) == " " + text

    def test_long_page_multiple_segments(self):
        text = " ".join(f"w{i}" for i in range(150))
        entries = page_entries(text)
        assert entries[0].start == 0.0
        assert entries[1].start == 6.0  # 12 tokens * 0.5s
        segs = segment_entries(entries)
        # 150 tokens → 60/60/30 → 3 segments
        assert len(segs) == 3
        assert full_text(segs) == " " + text
        assert segs[0].end == 30.0 and segs[1].end == 60.0
        assert segs[2].end == 75.0  # 150 * 0.5


class TestExtraction:
    GAZ = [
        ("Ada Lovelace", "PERSON"),
        ("Lovelace", "PERSON"),
        ("Zurich", "GPE"),
        ("Mona Lisa", "WORK_OF_ART"),
    ]

    def test_whole_token_match_and_offsets(self):
        text = "saw Ada Lovelace in Zurich"
        m = extract_mentions(text, self.GAZ)
        assert ("Ada Lovelace", "PERSON", 4) in m
        assert ("Lovelace", "PERSON", 8) in m
        assert ("Zurich", "GPE", 20) in m

    def test_no_substring_match(self):
        assert extract_mentions("Zuriche is not a city", self.GAZ) == []

    def test_label_filter_and_cap(self):
        gaz = [(f"E{i}", "PERSON") for i in range(15)] + [("X", "EVENT")]
        text = "X " + " ".join(f"E{i}" for i in range(15))
        rows = triples_for_doc("d", text, gaz)
        assert len(rows) == 10  # cap AFTER label filter
        assert all(r[1] == "contains_entity" for r in rows)
        # first-occurrence order pinned: E0..E9 survive
        assert rows[0][2] == "entity:e0" and rows[-1][2] == "entity:e9"

    def test_normalization(self):
        rows = triples_for_doc("d", "Ada Lovelace", [("Ada Lovelace", "PERSON")])
        assert rows[0][2] == "entity:ada_lovelace"
        assert rows[0][3] == "edge:d:entity:ada_lovelace:contains_entity"

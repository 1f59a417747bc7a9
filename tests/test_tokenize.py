"""Tokenizer golden tests — FIXTURES.md F3 (drop rules, identifier splitting,
trigrams, path expansion, normalization)."""

import numpy as np
import pyarrow as pa
import pytest

from poseidon_ray.functions import tokenize as tk


def run_code(text: str) -> dict[str, int]:
    terms, tfs, dl = tk.tokenize_code(pa.array([text]))
    return dict(zip(terms[0], tfs[0]))


class TestCodeDropRules:
    def test_lowercase(self):
        assert "foobar" in run_code("FooBar FOOBAR foobar")

    def test_min_len(self):
        toks = run_code("a if go x yz")
        assert "a" not in toks and "x" not in toks
        assert {"if", "go", "yz"} <= set(toks)

    def test_max_len(self):
        long = "z" * 129
        ok = "y" * 128
        toks = run_code(f"{long} {ok}")
        assert long not in toks and ok in toks

    def test_digit_rule(self):
        toks = run_code("1234 12345 99")
        assert "12345" in toks
        assert "1234" not in toks and "99" not in toks

    def test_hex_rule(self):
        # 0x1f2 (len 5) dropped, 0x1f2a (len 6) kept
        toks = run_code("0x1f2 0x1f2a")
        assert "0x1f2a" in toks
        assert "0x1f2" not in toks

    def test_identifier_split_snake(self):
        toks = run_code("parse_log_line")
        assert {"parse_log_line", "parse", "log", "line"} <= set(toks)

    def test_identifier_split_camel(self):
        toks = run_code("getDocIdList")
        assert "getdocidlist" in toks
        assert {"get", "doc", "id", "list"} <= set(toks)

    def test_tf_counts(self):
        toks = run_code("return foo return bar return")
        assert toks["return"] == 3 and toks["foo"] == 1

    def test_punctuation_split(self):
        toks = run_code("obj.method(arg1, arg2); // comment")
        assert {"obj", "method", "arg1", "arg2", "comment"} <= set(toks)

    def test_empty_and_null(self):
        terms, tfs, dl = tk.tokenize_code(pa.array(["", None, "   "]))
        assert terms == [[], [], []]
        assert list(dl) == [0, 0, 0]

    def test_doc_len_is_total_occurrences(self):
        _terms, _tfs, dl = tk.tokenize_code(pa.array(["foo foo bar"]))
        assert dl[0] == 3

    def test_cjk_kept_at_len2(self):
        toks = run_code("错误 日志行")
        assert "错误" in toks and "日志行" in toks


class TestTrigram:
    def test_basic(self):
        terms, tfs, dl = tk.tokenize_trigram(pa.array(["abcd"]))
        assert set(terms[0]) == {"abc", "bcd"}
        assert dl[0] == 2

    def test_normalization(self):
        # lowercase + whitespace collapse before windowing
        t1, _, _ = tk.tokenize_trigram(pa.array(["A  B\tC"]))
        t2, _, _ = tk.tokenize_trigram(pa.array(["a b c"]))
        assert t1[0] == t2[0]

    def test_counts(self):
        terms, tfs, _ = tk.tokenize_trigram(pa.array(["aaaa"]))
        d = dict(zip(terms[0], tfs[0]))
        assert d["aaa"] == 2

    def test_short(self):
        terms, _, dl = tk.tokenize_trigram(pa.array(["ab", ""]))
        assert terms == [[], []] and list(dl) == [0, 0]

    def test_multibyte_roundtrip(self):
        # non-ASCII content: trigrams over utf-8 bytes, stored latin-1;
        # must be deterministic and parquet-safe
        terms, _, _ = tk.tokenize_trigram(pa.array(["日志x"]))
        assert len(terms[0]) > 0
        t = pa.table({"t": terms[0]})
        assert t.num_rows == len(terms[0])


class TestKeywordAndPath:
    def test_keyword(self):
        terms, tfs, dl = tk.tokenize_keyword(pa.array(["  Go ", "", "java"]))
        assert terms == [["go"], [], ["java"]]
        assert list(dl) == [1, 0, 1]

    def test_path_expansion(self):
        toks = tk.expand_path("src/Pkg/Util.java")
        assert toks[0] == "src/pkg/util.java"
        assert {"src", "pkg", "util.java", "src/pkg", "pkg/util.java"} <= set(toks)

    def test_path_dedup(self):
        assert tk.expand_path("a/a") == ["a/a", "a"]

    def test_path_empty(self):
        assert tk.expand_path("") == []


class TestQueryNormalization:
    def test_shared_normalizer(self):
        assert tk.normalize_query_term("  ReTurn ") == "return"

    def test_tokenize_query_dedup_sorted(self):
        assert tk.tokenize_query("foo bar foo") == ["bar", "foo"]

    def test_query_matches_build_tokens(self):
        # the M14 consistency property: query tokens ⊆ build tokens
        content = "def parse_log(line): return line.split()"
        build = set(run_code(content))
        for q in tk.tokenize_query("parse_log line RETURN"):
            assert q in build

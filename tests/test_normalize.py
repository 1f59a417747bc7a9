"""Function-chain surface (M4/M5/M8/M9/M10 analogs) + blacklist filter
(M11) + posting cap (A6) + salting shard split (A7)."""

import base64

import pyarrow as pa
import pytest

from poseidon_ray.functions import normalize as nz
from poseidon_ray.functions import tokenize as tk


class TestSteps:
    def test_urldecode(self):
        assert nz.urldecode("a%20b+c") == ["a b c"]

    def test_base64decode(self):
        assert nz.base64decode(base64.b64encode(b"hello").decode()) == ["hello"]
        assert nz.base64decode("!!!notbase64") == []

    def test_ip_expansion(self):
        assert nz.expand_ip("10.1.2.3") == ["10.1.2.3", "10.1.2"]
        assert nz.expand_ip("not.an.ip") == []

    def test_url_expansion(self):
        out = nz.expand_url("http://www.example.com:8080/a/b/c?q=1")
        assert "www.example.com" in out
        assert "www.example.com:8080" in out
        assert "example.com" in out            # suffix-domain walk
        assert "www.example.com/a" in out
        assert "www.example.com/a/b" in out

    def test_regexcheck(self):
        step = nz._make_regexcheck(base64.b64encode(rb"^\d+$").decode())
        assert step("12345") == ["12345"]
        assert step("x12") == []


class TestChains:
    def test_split_chain(self):
        tok = nz.make_chain_tokenizer("trim|split:[,;]|lowercase")
        terms, tfs, dl = tok(pa.array([" A,b;A "]))
        assert dict(zip(terms[0], tfs[0])) == {"a": 2, "b": 1}
        assert dl[0] == 3

    def test_chain_with_terminal_tokenizer(self):
        tok = nz.make_chain_tokenizer("urldecode|code")
        terms, _, _ = tok(pa.array(["parse%20log%20return"]))
        assert {"parse", "log", "return"} <= set(terms[0])

    def test_register_chain_usable_in_spec(self):
        nz.register_chain("test_kv", "split:&|split:=|lowercase")
        try:
            terms, _, _ = tk.TOKENIZERS["test_kv"](pa.array(["K=V&X=Y"]))
            assert set(terms[0]) == {"k", "v", "x", "y"}
        finally:
            tk.TOKENIZERS.pop("test_kv")

    def test_unknown_step(self):
        with pytest.raises(ValueError, match="unknown chain step"):
            nz.parse_chain("nope")


class TestBlacklistFilter:
    """M11 tokenfilter analog: stopword drop in the tokenize stage (the
    reference loads blacklist files incl. one with an unterminated last
    line, FilterFunctionTest — we parse the same shape)."""

    def test_blacklist_drops_terms(self, tmp_path):
        import numpy as np

        from poseidon_ray.stages.tokenstage import make_chunks
        from poseidon_ray.schema import IndexSpec

        spec = IndexSpec(num_partitions=4)
        terms = [["return", "error", "widget"]]
        tfs = [[3, 1, 1]]
        out = make_chunks("content", terms, tfs,
                          np.array([5], dtype=np.uint32),
                          np.array([0], dtype=np.uint64),
                          spec, frozenset(), frozenset({"return"}))
        assert set(out["term"].to_pylist()) == {"error", "widget"}

    def test_blacklist_file_unterminated_line(self, tmp_path):
        # the filter2 fixture shape: last line has no newline
        p = tmp_path / "bl.txt"
        p.write_bytes(b"foo\nbar")
        tokens = {t.strip() for t in p.read_text().splitlines() if t.strip()}
        assert tokens == {"foo", "bar"}


class TestPostingCapAndSalting:
    def test_posting_cap_accounted(self, ray_session, tiny_corpus_path, tmp_path):
        from poseidon_ray.pipelines.build import build_index
        from poseidon_ray.pipelines.query import Searcher
        from poseidon_ray.schema import IndexSpec

        out = str(tmp_path / "cap")
        spec = IndexSpec(num_partitions=4, posting_cap=10)
        build_index(tiny_corpus_path, out, spec)
        s = Searcher(out)
        # 'return' appears in far more than 10 docs of the tiny corpus
        df, cf = s.term_stats("content", "return")
        ids, tfs, dls = s.postings("content", "return")
        assert len(ids) <= 10 * spec.num_partitions  # cap is per shard
        assert cf > len(ids)          # cf stays truthful (PV-sentinel rule)
        e = s._dir[("content", "return")]
        # truncation is visible in the directory
        import pyarrow.parquet as pq

        dirs = pq.read_table(f"{out}/directory/directory-00000.parquet")
        assert "cf_truncated" in dirs.column_names

    def test_hot_term_splits_across_shards(self, ray_session, tiny_corpus_path,
                                           tmp_path):
        from poseidon_ray.pipelines.build import build_index
        from poseidon_ray.pipelines.query import Searcher
        from poseidon_ray.schema import IndexSpec

        out = str(tmp_path / "salt")
        spec = IndexSpec(num_partitions=8, salt_factor=4,
                         static_hot_terms=("return",))
        build_index(tiny_corpus_path, out, spec)
        s = Searcher(out)
        e = s._dir[("content", "return")]
        assert len(e["shards"]) > 1          # physically split
        cold = s._dir[("content", "error")]
        assert len(cold["shards"]) == 1      # non-hot stays single
        # postings still exact: ascending unique ids
        ids, _, _ = s.postings("content", "return")
        import numpy as np

        assert (np.diff(ids.astype(np.int64)) > 0).all()

    def test_detect_hot_terms(self, ray_session, tiny_corpus_path):
        import ray.data

        from poseidon_ray.pipelines.build import detect_hot_terms
        from poseidon_ray.schema import IndexSpec

        ds = ray.data.read_parquet(tiny_corpus_path).map_batches(
            lambda t: t.append_column(
                "doc_id", pa.array(range(t.num_rows), type=pa.uint64())),
            batch_format="pyarrow")
        spec = IndexSpec(num_partitions=4, salt_threshold=50)
        hot = detect_hot_terms(ds, spec, sample_frac=0.5)
        assert "return" in hot or "the" in hot or len(hot) > 0


def test_build_with_blacklist_file(ray_session, tiny_corpus_path, tmp_path):
    from poseidon_ray.pipelines.build import build_index
    from poseidon_ray.pipelines.query import Searcher
    from poseidon_ray.schema import IndexSpec

    bl = tmp_path / "stop.txt"
    bl.write_bytes(b"return\nerror")  # unterminated last line, filter2-style
    out = str(tmp_path / "blidx")
    build_index(tiny_corpus_path, out, IndexSpec(num_partitions=4),
                blacklist_path=str(bl))
    s = Searcher(out)
    assert s.term_stats("content", "return") == (0, 0)
    assert s.term_stats("content", "error") == (0, 0)
    assert s.term_stats("content", "timeout")[0] > 0

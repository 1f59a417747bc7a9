"""Value normalizers + parameterized tokenizer chains — the analog of the
reference's per-field ``Function`` chain surface
(``plugin/Function/Function.java:9-14``: ``Set<String> Process(String)``,
registered by name in ``TokenParser.Add``, TokenParser.java:27-58, semantics
docs/config.md:35-67).

A chain spec is a string: ``"name"`` or ``"name:param"`` steps joined by
``|``, e.g. ``"urldecode|split:[,;]|lowercase"``. Steps are applied left to
right; value-level steps (normalizers) map str -> str, expanding steps map
str -> list[str] (applied element-wise thereafter). ``make_chain_tokenizer``
wraps a chain as a batch tokenizer compatible with ``TOKENIZERS``.

Covered reference functions:
  urldecode / urlencode / base64decode    (UrlDecodeFunction.java:10-29 etc.)
  regexcheck:<b64 regex>                  keep value iff match (RegexCheck.java:12-45)
  split:<regex>                           (SplitFunction.java:9-35)
  url                                     url expansion (Util.java:226-308)
  ip                                      ip + /24 prefix (Util.java:167-187)
  path                                    component expansion (Util.java:189-224)
  keyword / lowercase / trim              (KeywordFunction, LowerCaseFunction)
  code / simple / trigram                 this engine's word tokenizers
"""

from __future__ import annotations

import base64
import binascii
import re
import urllib.parse

import numpy as np
import pyarrow as pa

from poseidon_ray.functions import tokenize as tk

# ----------------------------------------------------------- value steps

def urldecode(v: str) -> list[str]:
    return [urllib.parse.unquote_plus(v)]


def urlencode(v: str) -> list[str]:
    return [urllib.parse.quote_plus(v)]


def base64decode(v: str) -> list[str]:
    try:
        return [base64.b64decode(v, validate=True).decode("utf-8", "replace")]
    except (binascii.Error, ValueError):
        return []  # the reference drops undecodable values


def lowercase(v: str) -> list[str]:
    return [v.lower()]


def trim(v: str) -> list[str]:
    return [v.strip()]


def expand_ip(v: str) -> list[str]:
    """ip plus its /24 prefix (Util.ParseIp analog)."""
    v = v.strip()
    if not re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", v):
        return []
    return [v, v.rsplit(".", 1)[0]]


def expand_url(v: str) -> list[str]:
    """URL expansion (Util.ParseUrl analog): full url, host, host:port,
    suffix domains, host + first path component(s). Deduped, order kept."""
    v = v.strip().lower()
    if not v:
        return []
    parsed = urllib.parse.urlparse(v if "://" in v else "http://" + v)
    host = parsed.hostname or ""
    out = [v]
    if host:
        out.append(host)
        if parsed.port:
            out.append(f"{host}:{parsed.port}")
        labels = host.split(".")
        for i in range(1, len(labels) - 1):
            out.append(".".join(labels[i:]))  # suffix-domain walk
        comps = [c for c in parsed.path.split("/") if c]
        if comps:
            out.append(f"{host}/{comps[0]}")
            if len(comps) >= 2:
                out.append(f"{host}/{comps[0]}/{comps[1]}")
    seen: set[str] = set()
    return [t for t in out if not (t in seen or seen.add(t))]


def _make_split(pattern: str):
    rx = re.compile(pattern)

    def split_step(v: str) -> list[str]:
        return [p for p in rx.split(v) if p]

    return split_step


def _make_regexcheck(b64_pattern: str):
    """Keep the value iff it matches; pattern arrives base64-coded exactly
    like the reference config (RegexCheck.java:12-45)."""
    rx = re.compile(base64.b64decode(b64_pattern).decode())

    def check_step(v: str) -> list[str]:
        return [v] if rx.search(v) else []

    return check_step


_STEP_FACTORIES = {
    "urldecode": lambda: urldecode,
    "urlencode": lambda: urlencode,
    "base64decode": lambda: base64decode,
    "lowercase": lambda: lowercase,
    "trim": lambda: trim,
    "ip": lambda: expand_ip,
    "url": lambda: expand_url,
    "path": lambda: (lambda v: tk.expand_path(v)),
    "keyword": lambda: (lambda v: [v.strip().lower()] if v.strip() else []),
    "split": _make_split,          # takes a parameter
    "regexcheck": _make_regexcheck,
}

# terminal word tokenizers usable as the last chain step
_TERMINAL = {"code", "simple", "trigram"}


def parse_chain(spec: str):
    """'step|step:param|...' -> list of callables str -> list[str]."""
    steps = []
    for raw in spec.split("|"):
        raw = raw.strip()
        name, _, param = raw.partition(":")
        if name in _TERMINAL:
            steps.append(("terminal", name))
            continue
        factory = _STEP_FACTORIES.get(name)
        if factory is None:
            raise ValueError(f"unknown chain step {name!r} "
                             f"(known: {sorted(_STEP_FACTORIES) + sorted(_TERMINAL)})")
        steps.append(("fn", factory(param) if param else factory()))
    return steps


def _aggregate_weighted(terms: list, tfs: list, parents: np.ndarray, n_rows: int):
    """(row, term) -> Σtf, split back into per-row sorted lists (the
    weighted cousin of tokenize._aggregate_tf)."""
    import pandas as pd

    if not terms:
        empty = [[] for _ in range(n_rows)]
        return empty, [[] for _ in range(n_rows)], np.zeros(n_rows, np.uint32)
    df = pd.DataFrame({"p": parents, "t": terms, "f": tfs})
    g = df.groupby(["p", "t"], sort=True)["f"].sum().reset_index()
    gp = g["p"].to_numpy()
    gt = g["t"].to_numpy()
    gf = g["f"].to_numpy().astype(np.int64)
    bounds = np.searchsorted(gp, np.arange(n_rows + 1))
    terms_out = [gt[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)]
    tfs_out = [gf[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)]
    doc_len = np.zeros(n_rows, dtype=np.uint32)
    np.add.at(doc_len, gp, gf)
    return terms_out, tfs_out, doc_len


def make_chain_tokenizer(spec: str):
    """Compile a chain spec into a batch tokenizer with the standard
    (terms_per_row, tfs_per_row, doc_len) signature. Register the result in
    ``tokenize.TOKENIZERS`` under any name to use it in an IndexSpec.

    Batch-structured: value steps run over ONE flat value list with parent
    tracking (the per-value Python call is inherent to the reference's
    Function semantics), the terminal word tokenizer runs ONCE per batch,
    and tf aggregation is a single vectorized groupby — no per-row
    pa.array round-trips or Counters."""
    steps = parse_chain(spec)

    def tokenizer(values: pa.Array):
        import pyarrow.compute as pc

        raw = pc.fill_null(values, "").to_pylist()
        n_rows = len(raw)
        vals: list[str] = raw
        parents = np.arange(n_rows, dtype=np.int64)
        for kind, step in steps:
            if kind == "fn":
                out_v: list[str] = []
                out_p: list[int] = []
                for v, p in zip(vals, parents):
                    for o in step(v):
                        out_v.append(o)
                        out_p.append(p)
                vals = out_v
                parents = np.asarray(out_p, dtype=np.int64)
            else:  # terminal word tokenizer, one batch call
                arr = pa.array(vals, type=pa.string())
                t_rows, f_rows, _ = tk.TOKENIZERS[step](arr)
                flat_t: list[str] = []
                flat_f: list[int] = []
                flat_p: list[int] = []
                for (ts, fs), p in zip(zip(t_rows, f_rows), parents):
                    flat_t.extend(ts)
                    flat_f.extend(fs)
                    flat_p.extend([p] * len(ts))
                return _aggregate_weighted(
                    flat_t, flat_f, np.asarray(flat_p, dtype=np.int64), n_rows)
        # no terminal step: surviving values themselves are the terms
        return _aggregate_weighted(vals, [1] * len(vals), parents, n_rows)

    return tokenizer


def register_chain(name: str, spec: str) -> None:
    """Register a chain tokenizer by name (the TokenParser.Add analog)."""
    tk.TOKENIZERS[name] = make_chain_tokenizer(spec)

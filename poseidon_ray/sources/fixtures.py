"""Deterministic synthetic source-code corpus (FIXTURES.md F1) + reference
query set (F2). Seeded, no external data — per BASELINE.json input_hint the
corpus shape is exactly (repo, path, commit, lang, content).

Content embeds, by construction:
  (a) stopword-like hot tokens (return/import/def/if) in >=60% of rows
      (skew + salting coverage, SURVEY §2.5 A6-A7),
  (b) rare unique tokens ``uniq_tok_{row}`` in ~5% of rows,
  (c) CJK comment lines,
  (d) tokens at drop-rule length boundaries (digits len 4/5, hex len 5/6,
      1-char vs 2-char identifiers, 128/129 chars),
  (e) a few oversized files (wide-record path).
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "go", "java", "c", "markdown"]
EXT = {"python": "py", "go": "go", "java": "java", "c": "c", "markdown": "md"}

_IDENT_POOL = [
    "parse_line", "buildIndex", "doc_id", "offset", "tokenizer", "flushBuffer",
    "http_client", "merge_segments", "readFile", "writeFile", "config", "value",
    "hash_term", "postings", "queryEngine", "scoreDocs", "block_max", "cursor",
    "varint", "delta_encode", "manifest", "checkpoint", "shard", "partition",
]
_WORD_POOL = [
    "error", "warning", "retry", "timeout", "connect", "server", "client",
    "stream", "batch", "arrow", "parquet", "index", "search", "token",
    "lucene", "engine", "kernel", "buffer", "socket", "thread",
]
_BOUNDARY_TOKENS = [
    "ab", "x", "1234", "12345", "0x1f2", "0x1f2ab", "y" * 128, "z" * 129,
]
_CJK_LINES = ["# 错误 日志行 处理", "// 索引 构建 完成"]


def _make_content(rng: random.Random, row: int, lang: str) -> str:
    lines = []
    hot = rng.random() < 0.65
    n_funcs = rng.randint(1, 4)
    for f in range(n_funcs):
        name = rng.choice(_IDENT_POOL)
        arg = rng.choice(_WORD_POOL)
        if lang == "python":
            lines.append(f"def {name}_{f}({arg}):")
            if hot:
                lines.append(f"    if {arg} is None:")
                lines.append(f"        return None")
            lines.append(f"    return {name}({arg})")
        elif lang == "go":
            lines.append(f"func {name}{f}({arg} string) error {{")
            if hot:
                lines.append(f"\tif {arg} == \"\" {{ return nil }}")
            lines.append(f"\treturn process({arg})")
            lines.append("}")
        else:
            lines.append(f"int {name}_{f}(char *{arg}) {{")
            if hot:
                lines.append(f"  if (!{arg}) return -1;")
            lines.append(f"  return handle({arg});")
            lines.append("}")
    if hot and lang == "python":
        lines.insert(0, "import os")
    for _ in range(rng.randint(2, 8)):
        lines.append("// " + " ".join(rng.choice(_WORD_POOL) for _ in range(rng.randint(3, 9))))
    if rng.random() < 0.10:
        lines.append(rng.choice(_CJK_LINES))
    if rng.random() < 0.15:
        lines.append("// " + " ".join(rng.sample(_BOUNDARY_TOKENS, 3)))
    if rng.random() < 0.05:
        lines.append(f"UNIQUE_MARKER = 'uniq_tok_{row}'")
    if rng.random() < 0.005:
        # wide record: >256 KB
        lines.append("data = '" + "padword " * 40000 + "'")
    return "\n".join(lines)


def corpus_table(n_rows: int, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        repo = f"org{i % 7}/repo{i % 53}"
        lang = rng.choices(LANGS, weights=[4, 3, 2, 2, 1])[0]
        pkg = rng.choice(["core", "util", "io", "net", "index"])
        name = rng.choice(_IDENT_POOL).replace("_", "")
        # row index in the filename keeps (repo, path) unique per row => the
        # docID sort key (repo, path, commit) is total-order deterministic
        path = f"src/{pkg}/{name}{i}.{EXT[lang]}"
        rev = 0 if rng.random() < 0.95 else 1  # a few files at 2 commits
        commit = hashlib.sha1(f"{repo}:{path}:{rev}".encode()).hexdigest()[:40]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(_make_content(rng, i, lang))
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits,
         "lang": langs, "content": contents}
    )


def write_corpus(path: str, n_rows: int, seed: int = 42,
                 row_group_size: int = 1000) -> None:
    pq.write_table(corpus_table(n_rows, seed), path,
                   row_group_size=row_group_size, compression="zstd")


def reference_queries() -> list[dict]:
    """The F2 reference query set: deterministic, covers hot/rare/absent
    single terms, conjunctions, disjunctions, field-scoped and tie-prone
    queries. ``mode``: and|or; ``field``: content|path|repo|lang|content3."""
    qs = [
        {"name": "hot_single", "field": "content", "mode": "or", "text": "return"},
        {"name": "hot_single2", "field": "content", "mode": "or", "text": "import"},
        {"name": "rare_single", "field": "content", "mode": "or", "text": "uniq_tok_17"},
        {"name": "absent", "field": "content", "mode": "or", "text": "zzznotfoundzzz"},
        {"name": "and2", "field": "content", "mode": "and", "text": "return error"},
        {"name": "and3", "field": "content", "mode": "and", "text": "return timeout retry"},
        {"name": "and_rare", "field": "content", "mode": "and", "text": "uniq_tok_17 return"},
        {"name": "or2", "field": "content", "mode": "or", "text": "lucene engine"},
        {"name": "or4", "field": "content", "mode": "or", "text": "error warning retry timeout"},
        {"name": "ident", "field": "content", "mode": "or", "text": "parse_line"},
        {"name": "ident_sub", "field": "content", "mode": "or", "text": "buildindex"},
        {"name": "camel_parts", "field": "content", "mode": "and", "text": "flush buffer"},
        {"name": "tie_prone", "field": "content", "mode": "or", "text": "process"},
        {"name": "path_comp", "field": "path", "mode": "or", "text": "core"},
        {"name": "path_pair", "field": "path", "mode": "or", "text": "src/util"},
        {"name": "repo_kw", "field": "repo", "mode": "or", "text": "org3/repo17"},
        {"name": "lang_kw", "field": "lang", "mode": "or", "text": "go"},
        {"name": "trigram_sub", "field": "content3", "mode": "and", "text": "turn"},
        {"name": "trigram_rare", "field": "content3", "mode": "and", "text": "uniq_tok"},
        {"name": "hex_tok", "field": "content", "mode": "or", "text": "0x1f2ab"},
        {"name": "digit_tok", "field": "content", "mode": "or", "text": "12345"},
        {"name": "cjk", "field": "content", "mode": "or", "text": "错误"},
    ]
    return qs

"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1-2).

The reference ships no test data (its 11-image dataset exists only as numbers
in ``findings.md``; images are gitignored). This generator is the repo's
authoritative fixture source: seeded, pure-Python, emitting the exact
``(repo, path, commit, lang, content)`` shape of BASELINE.json's input_hint
plus golden duplicate pairs / clusters for recall measurement.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

_LANGS = ["python", "java", "js", "go", "c", "text"]
_LANG_W = [0.40, 0.15, 0.15, 0.10, 0.10, 0.10]

_KW = {
    "python": ("def", "return", "class", "import", "for", "if", "else", "while", "lambda"),
    "java": ("public", "static", "void", "class", "return", "new", "int", "final"),
    "js": ("function", "const", "let", "return", "class", "export", "async", "await"),
    "go": ("func", "package", "return", "type", "struct", "var", "range", "defer"),
    "c": ("int", "void", "return", "struct", "static", "char", "for", "while"),
    "text": ("the", "and", "data", "with", "from", "this", "value", "table"),
}

LICENSE_HEADER = (
    "// Licensed under the Apache License, Version 2.0 (the License);\n"
    "// you may not use this file except in compliance with the License.\n"
    "// distributed on an AS IS BASIS WITHOUT WARRANTIES OR CONDITIONS.\n"
)


@dataclass
class Corpus:
    rows: list[dict] = field(default_factory=list)           # source_files rows
    golden_pairs: list[dict] = field(default_factory=list)   # planted dup pairs (by row index)
    silenced: list[tuple[int, int]] = field(default_factory=list)

    def row_key(self, i: int) -> tuple[str, str, str]:
        r = self.rows[i]
        return (r["repo"], r["path"], r["commit"])


def _ident(rng: random.Random, vocab: list[str]) -> str:
    return rng.choice(vocab) + "_" + rng.choice(vocab)


def _base_file(rng: random.Random, lang: str, vocab: list[str]) -> str:
    kws = _KW[lang]
    n_lines = rng.randint(5, 120)
    lines = []
    for _ in range(n_lines):
        kind = rng.random()
        if kind < 0.15:
            lines.append(f"# {' '.join(rng.choice(vocab) for _ in range(rng.randint(2, 6)))}")
        elif kind < 0.45:
            lines.append(f"{rng.choice(kws)} {_ident(rng, vocab)}({_ident(rng, vocab)}):")
        else:
            lines.append(
                f"    {_ident(rng, vocab)} = {rng.choice(kws)}({_ident(rng, vocab)}, {rng.randint(0, 999)})"
            )
    return "\n".join(lines) + "\n"


def _mutate(rng: random.Random, content: str, vocab: list[str]) -> tuple[str, str]:
    """Apply one seeded mutation; returns (mutated, mutation_name)."""
    lines = content.split("\n")
    op = rng.choice(["rename", "lines", "reorder", "whitespace"])
    if op == "rename":
        # rename a handful of identifier tokens
        # sorted(): set iteration order follows the per-process string-hash
        # salt (PYTHONHASHSEED), so sampling from raw set order made the
        # "deterministic" generator emit different renames in every process
        src = sorted(w for w in set(content.replace("(", " ").replace(")", " ").split()) if "_" in w)
        out = content
        for w in rng.sample(src, min(3, len(src))) if src else []:
            out = out.replace(w, _ident(rng, vocab))
        return out, "rename"
    if op == "lines":
        k = max(1, len(lines) // 12)  # ≤ ~8% of lines touched
        for _ in range(k):
            i = rng.randrange(len(lines))
            if rng.random() < 0.5 and len(lines) > 3:
                del lines[i]
            else:
                lines.insert(i, f"    {_ident(rng, vocab)} = {rng.randint(0, 99)}")
        return "\n".join(lines), "lines"
    if op == "reorder":
        if len(lines) > 10:
            cut = rng.randrange(2, len(lines) - 2)
            lines = lines[cut:] + lines[:cut]
        return "\n".join(lines), "reorder"
    # whitespace/comments only
    return content.replace("    ", "\t").replace("# ", "## "), "whitespace"


def generate_corpus(
    n_base: int = 50,
    seed: int = 42,
    skew: bool = False,
    edge_rows: bool = True,
) -> Corpus:
    """Build a corpus of ~2.4x n_base rows with planted exact/near/containment
    duplicates (FIXTURES.md generator recipe; seeded, deterministic)."""
    rng = random.Random(seed)
    vocab = [f"{w}{i}" for i in range(40) for w in ("val", "node", "buf", "cfg", "idx")]
    rng.shuffle(vocab)
    corpus = Corpus()

    def add_row(content: str, lang: str, repo_i: int, tag: str) -> int:
        i = len(corpus.rows)
        repo = f"org{repo_i % max(2, int(n_base ** 0.5))}/proj{repo_i % 7}"
        path = f"src/pkg_{i % 13}/mod_{i}_{tag}.{lang[:2]}"
        commit = hashlib.sha1(f"{repo}:{seed}:{i}".encode()).hexdigest() + "00000000"[:0]
        commit = (commit + "0" * 40)[:40]
        corpus.rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
        )
        return i

    base_idx: list[int] = []
    for b in range(n_base):
        lang = rng.choices(_LANGS, weights=_LANG_W)[0]
        content = _base_file(rng, lang, vocab)
        if skew and rng.random() < 0.5:
            content = LICENSE_HEADER + content
        base_idx.append(add_row(content, lang, b, "base"))

    # exact duplicates: 10% of bases, 1-3 copies each
    for b in rng.sample(base_idx, max(1, n_base // 10)):
        for c in range(rng.randint(1, 3)):
            j = add_row(corpus.rows[b]["content"], corpus.rows[b]["lang"], b + 1000 + c, "exact")
            corpus.golden_pairs.append({"ia": b, "ib": j, "kind": "exact", "mutation": "copy"})

    # near duplicates: 20% of bases
    for b in rng.sample(base_idx, max(1, n_base // 5)):
        mutated, op = _mutate(rng, corpus.rows[b]["content"], vocab)
        j = add_row(mutated, corpus.rows[b]["lang"], b + 2000, "near")
        corpus.golden_pairs.append({"ia": b, "ib": j, "kind": "near", "mutation": op})

    # containment duplicates: 5% of bases embedded verbatim in a larger file
    for b in rng.sample(base_idx, max(1, n_base // 20)):
        filler = _base_file(rng, corpus.rows[b]["lang"], vocab)
        big = filler + "\n" + corpus.rows[b]["content"] + "\n" + _base_file(rng, corpus.rows[b]["lang"], vocab)
        j = add_row(big, corpus.rows[b]["lang"], b + 3000, "contain")
        corpus.golden_pairs.append({"ia": b, "ib": j, "kind": "containment", "mutation": "embed"})

    if edge_rows:
        add_row("", "text", 9001, "empty")
        add_row("   \n\t  \n", "text", 9002, "ws")
        add_row("y" * ((1 << 20) + 10), "text", 9003, "big")
        add_row("bad\x00\x01\x02bytes\x07here", "text", 9004, "bin")

    # silenced: a couple of golden pairs the report must suppress
    if len(corpus.golden_pairs) >= 4:
        picks = rng.sample(range(len(corpus.golden_pairs)), 2)
        for p in picks:
            gp = corpus.golden_pairs[p]
            corpus.silenced.append((gp["ia"], gp["ib"]))
    return corpus


def corpus_to_pandas(corpus: Corpus):
    import pandas as pd

    return pd.DataFrame(corpus.rows, columns=["repo", "path", "commit", "lang", "content"])

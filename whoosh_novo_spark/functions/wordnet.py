"""WordNet thesaurus: parse the public ``wn_s.pl`` prolog synset file
(http://wordnetcode.princeton.edu/3.0/WNprolog-3.0.tar.gz) and expand
query terms with synonyms.

Reference surface: src/whoosh/lang/wordnet.py (parse_file / synonyms /
Thesaurus with from_file/from_filename/to_storage/from_storage).  The
storage form here is Spark-native — a parquet (word, syns) table —
instead of a whoosh index; lookups load a bounded driver-side dict
(WordNet 3.0 is ~86k synsets, metadata scale, never data scale).

Note: the reference's ``Thesaurus.from_filename`` is broken on py3 (it
opens the file in binary mode then parses with str literals —
COVERAGE.md reference bug #9); ours opens in text mode.
"""

from __future__ import annotations

from collections import defaultdict


def parse_wn_prolog(lines) -> tuple[dict, dict]:
    """Parse wn_s.pl lines -> (word2nums, num2words).  Mirrors the
    reference's semantics: only ``s(`` facts, synset id up to the first
    comma, word between the first pair of single quotes, lowercased,
    non-alphabetic entries (multi-word collocations, digits) skipped."""
    word2nums: dict[str, list[int]] = defaultdict(list)
    num2words: dict[int, list[str]] = defaultdict(list)
    for line in lines:
        if not line.startswith("s("):
            continue
        body = line[2:]
        num = int(body[: body.find(",")])
        q1 = body.find("'")
        rest = body[q1 + 1 :]
        word = rest[: rest.find("'")].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms_of(word2nums: dict, num2words: dict, word: str) -> list[str]:
    """All words sharing a synset with ``word``, sorted, excluding the
    word itself."""
    syns: set[str] = set()
    for num in word2nums.get(word, ()):
        syns.update(num2words[num])
    syns.discard(word)
    return sorted(syns)


class Thesaurus:
    """In-memory or parquet-backed synonym lookup + query expansion."""

    def __init__(self):
        self._w2n: dict | None = None
        self._n2w: dict | None = None
        self._syn_map: dict[str, list[str]] | None = None

    # ---------------------------------------------------------- loading
    @classmethod
    def from_file(cls, fileobj) -> "Thesaurus":
        t = cls()
        t._w2n, t._n2w = parse_wn_prolog(fileobj)
        return t

    @classmethod
    def from_filename(cls, filename: str) -> "Thesaurus":
        with open(filename, encoding="utf-8", errors="replace") as f:
            return cls.from_file(f)

    # ---------------------------------------------------------- storage
    def to_storage(self, spark, path: str) -> None:
        """Persist as a (word string, syns array<string>) parquet table."""
        if not self._w2n:
            raise ValueError("no synonyms loaded")
        rows = [
            (w, synonyms_of(self._w2n, self._n2w, w)) for w in sorted(self._w2n)
        ]
        spark.createDataFrame(rows, "word string, syns array<string>").coalesce(
            1
        ).write.mode("overwrite").parquet(path)

    @classmethod
    def from_storage(cls, spark, path: str) -> "Thesaurus":
        t = cls()
        t._syn_map = {
            r["word"]: list(r["syns"]) for r in spark.read.parquet(path).collect()
        }
        return t

    # ----------------------------------------------------------- lookup
    def synonyms(self, word: str) -> list[str]:
        word = word.lower()
        if self._syn_map is not None:
            return self._syn_map.get(word, [])
        if self._w2n is None:
            raise ValueError("no synonyms loaded")
        return synonyms_of(self._w2n, self._n2w, word)


def expand_synonyms(q, thesaurus: Thesaurus, syn_boost: float = 1.0):
    """Rewrite every text Term leaf into Or((term, *synonyms)) — the
    query-time expansion the reference documents for Thesaurus usage.
    Synonym terms inherit the leaf's field and carry
    ``leaf.boost * syn_boost``; leaves with no synonyms are unchanged.
    Non-Term nodes recurse through their children."""
    from dataclasses import replace

    from whoosh_novo_spark.plans import ast

    if isinstance(q, ast.Term):
        syns = thesaurus.synonyms(q.text)
        if not syns:
            return q
        kids = (q,) + tuple(
            ast.Term(q.fieldname, s, boost=q.boost * syn_boost) for s in syns
        )
        return ast.Or(kids)
    for attr in ("children", "subqueries"):
        kids = getattr(q, attr, None)
        if kids:
            new = tuple(expand_synonyms(c, thesaurus, syn_boost) for c in kids)
            return replace(q, **{attr: new})
    for attr in ("child", "a", "b"):
        c = getattr(q, attr, None)
        if isinstance(c, ast.Query):
            q = replace(q, **{attr: expand_synonyms(c, thesaurus, syn_boost)})
    return q

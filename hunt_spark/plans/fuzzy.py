"""Fuzzy word expansion — a faithful port of the reference's fuzz
arithmetic (Hunt/Query/Fuzzy.hs:89-216: replacements applied in both
directions over every prefix/suffix split, adjacent-char swaps,
position weight (len-pos)/len, score-doubling recursion bounded by
maxFuzziness, union-min dedup, original word removed).

The LIVE reference evaluator never calls this module's Haskell
counterpart — QFuzzy evaluates as NoCase (Processor.hs:605-615 TODO) —
and the engine keeps exactly that default. An opt-in ``FuzzyConfig``
enables the classic Holumbus behavior the tables were written for:
try the word itself first, then fuzzed variants in ascending-fuzziness
order until one matches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ((a, b), score): a replaced by b and vice versa; scores normalized by
# the table's max before use (Fuzzy.hs replace)
Replacements = list[tuple[tuple[str, str], float]]

# Fuzzy.hs:91-110
ENGLISH_REPLACEMENTS: Replacements = [
    (("l", "ll"), 0.2),
    (("t", "tt"), 0.2),
    (("r", "rr"), 0.2),
    (("e", "ee"), 0.2),
    (("o", "oo"), 0.2),
    (("s", "ss"), 0.2),
    (("g", "ck"), 0.4),
    (("k", "ck"), 0.4),
    (("ea", "ee"), 0.4),
    (("ou", "oo"), 0.4),
    (("ou", "au"), 0.4),
    (("ou", "ow"), 0.4),
    (("s", "c"), 0.6),
    (("uy", "ye"), 0.6),
    (("y", "ey"), 0.6),
    (("kn", "n"), 0.6),
]

# Fuzzy.hs:112-135
GERMAN_REPLACEMENTS: Replacements = [
    (("l", "ll"), 0.2),
    (("t", "tt"), 0.2),
    (("n", "nn"), 0.2),
    (("r", "rr"), 0.2),
    (("i", "ie"), 0.2),
    (("ei", "ie"), 0.2),
    (("k", "ck"), 0.2),
    (("d", "t"), 0.4),
    (("b", "p"), 0.4),
    (("g", "k"), 0.4),
    (("g", "ch"), 0.4),
    (("c", "k"), 0.4),
    (("s", "z"), 0.4),
    (("u", "ou"), 0.4),
    (("ü", "ue"), 0.1),
    (("ä", "ae"), 0.1),
    (("ö", "oe"), 0.1),
    (("ß", "ss"), 0.1),
]


@dataclass
class FuzzyConfig:
    """Fuzzy.hs FuzzyConfig (defaults mirror `instance Default`).

    ``max_set_size`` is an addition the Haskell original lacks: the
    recursion's candidate set grows multiplicatively per level, so a
    hard cap (keep the lowest-score entries) bounds work for long
    words. With the default tables and max_fuzziness 1.0 the cap only
    engages on words the original would also blow up on."""

    apply_replacements: bool = True
    apply_swappings: bool = True
    max_fuzziness: float = 1.0
    replacements: Replacements = field(
        default_factory=lambda: list(ENGLISH_REPLACEMENTS)
    )
    max_set_size: int = 256


def replace_first(xs: str, ys: str, zs: str) -> str:
    """Fuzzy.hs replaceFirst — replace prefix ``xs`` of ``zs`` by
    ``ys`` (with the original's exact char-by-char semantics)."""
    if xs == "":
        return ys + zs
    if zs == "":
        return ""
    if xs[0] == zs[0] and zs.startswith(xs):
        if ys == "":
            return replace_first(xs[1:], "", zs[1:])
        return ys[0] + replace_first(xs[1:], ys[1:], zs[1:])
    return zs


def _union_min(acc: dict[str, float], new: dict[str, float]) -> None:
    for k, v in new.items():
        if k not in acc or v < acc[k]:
            acc[k] = v


def _apply_fuzz(f, sc: float, s: str) -> dict[str, float]:
    # Fuzzy.hs applyFuzz: prefix/suffix splits at 0..len-1, weight
    # (len - pos) / len
    out: dict[str, float] = {}
    n = len(s)
    for i in range(n):
        pr, su = s[:i], s[i:]
        weight = (n - i) / n
        for fuzzed, score in f(pr, su):
            v = sc + score * weight
            if fuzzed not in out or v < out[fuzzed]:
                out[fuzzed] = v
    return out


def _fuzz_internal(cfg: FuzzyConfig, sc: float, s: str) -> dict[str, float]:
    out: dict[str, float] = {}
    if cfg.apply_replacements and cfg.replacements:
        max_s = max(v for _p, v in cfg.replacements)

        for (r1, r2), rv in cfg.replacements:
            def rep(pr: str, su: str, r1=r1, r2=r2, rv=rv):
                res = []
                for tok, sub in ((r1, r2), (r2, r1)):
                    replaced = replace_first(tok, sub, su)
                    if replaced != su:
                        res.append((pr + replaced, rv / max_s))
                return res

            _union_min(out, _apply_fuzz(rep, sc, s))
    if cfg.apply_swappings:
        def swp(pr: str, su: str):
            if len(su) >= 2:
                return [(pr + su[1] + su[0] + su[2:], 1.0)]
            return []

        _union_min(out, _apply_fuzz(swp, sc, s))
    return out


def _fuzz_limit(cfg: FuzzyConfig, sc: float, s: str) -> dict[str, float]:
    th = cfg.max_fuzziness
    if sc > th:
        return {}
    return {k: v for k, v in _fuzz_internal(cfg, sc, s).items() if v <= th}


def fuzz(cfg: FuzzyConfig, s: str) -> dict[str, float]:
    """Fuzzy.hs fuzz: the scored set of fuzzed variants of ``s``
    (original removed). Scores double per recursion level."""
    def rec(fs: dict[str, float]) -> dict[str, float]:
        more: dict[str, float] = {}
        for sm, sc in fs.items():
            _union_min(more, _fuzz_limit(cfg, sc + sc, sm))
        if len(more) > cfg.max_set_size:
            more = dict(
                sorted(more.items(), key=lambda kv: (kv[1], kv[0]))[
                    : cfg.max_set_size
                ]
            )
        if not more:
            return fs
        out = dict(fs)
        _union_min(out, rec(more))
        return out

    out = rec(_fuzz_limit(cfg, 0.0, s))
    out.pop(s, None)
    return out


def fuzz_list(cfg: FuzzyConfig, s: str) -> list[tuple[str, float]]:
    """Fuzzy.hs toList: variants ordered by ascending score."""
    return sorted(fuzz(cfg, s).items(), key=lambda kv: (kv[1], kv[0]))

"""Deterministic synthetic `pages` fixture generator.

Produces the Common-Crawl-style pages table mandated by the driver
contract (BASELINE.json → input_hint):

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Pathological document classes are injected at FIXED rates so expected
keep/drop counts are computable and stable across runs (seeded
``random.Random``; no numpy global state, no wall clock). The domain
distribution is Zipf-skewed so per-domain aggregations exercise the
salting path.

Class rates (disjoint, applied in this order by a single uniform draw):
    0.00–0.04  too_short        (fails min_words)
    0.04–0.08  symbol_heavy     (fails symbol_to_word / nonalnum_frac)
    0.08–0.12  low_stopword     (fails stopword_frac)
    0.12–0.17  repetitive       (fails dup_line / top2gram / dup5gram)
    0.17–0.22  exact_dup        (text copied from an earlier clean page)
    0.22–0.25  gibberish        (fails perplexity / langid_conf)
    0.25–1.00  clean
Orthogonal overlays on clean docs:
    wrong_lang 10% (claimed tag ≠ generated language → lang_mismatch)
    pii        12% (emails/phones/IPs/SSNs injected)
    toxicity    6% (toxicity-list words injected)
    bad_html    2% (html bytes truncated → extraction ≠ original text)
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

from .config import LANGS
from .models.corpus import gen_sentence, gibberish_sentence

_DOMAINS_HEAVY = ["bigsite.example", "hugecdn.example"]
_DOMAINS_TAIL = [f"site{i}.example" for i in range(200)]
_EPOCH = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)


def _pick_domain(rng: random.Random) -> str:
    # Zipf-ish: 40% of pages on 2 heavy domains
    if rng.random() < 0.4:
        return rng.choice(_DOMAINS_HEAVY)
    return rng.choice(_DOMAINS_TAIL)


def _paragraphs_to_html(paras: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paras)
    return f"<html><body>{body}</body></html>".encode("utf-8")


def _inject_pii(paras: list[str], rng: random.Random) -> list[str]:
    bits = [
        f"contact {rng.choice(['alice', 'bob', 'carol'])}"
        f"{rng.randint(1, 99)}@mail{rng.randint(1, 9)}.example now",
        f"call +1-{rng.randint(200, 999)}-{rng.randint(200, 999)}-"
        f"{rng.randint(1000, 9999)} today",
        f"server at {rng.randint(1, 254)}.{rng.randint(0, 255)}."
        f"{rng.randint(0, 255)}.{rng.randint(1, 254)} port",
        f"id {rng.randint(100, 999)}-{rng.randint(10, 99)}-"
        f"{rng.randint(1000, 9999)} on file",
    ]
    k = rng.randint(1, 3)
    out = list(paras)
    for _ in range(k):
        i = rng.randrange(len(out))
        words = out[i].split(" ")
        pos = rng.randrange(len(words) + 1)
        words[pos:pos] = rng.choice(bits).split(" ")
        out[i] = " ".join(words)
    return out


def _inject_toxicity(paras: list[str], rng: random.Random) -> list[str]:
    from .config import TOXICITY_WORDS
    out = list(paras)
    for _ in range(rng.randint(1, 2)):
        i = rng.randrange(len(out))
        words = out[i].split(" ")
        pos = rng.randrange(len(words) + 1)
        words.insert(pos, rng.choice(TOXICITY_WORDS))
        out[i] = " ".join(words)
    return out


def make_pages(n: int = 2000, seed: int = 42,
               dup_frac: float = 0.0) -> pd.DataFrame:
    """Build the pages table as a pandas DataFrame (parquet-ready).

    ``dup_frac`` > 0 is the ADVERSARIAL-DUPLICATION knob (judge r4
    task #6): that fraction of all pages becomes verbatim same-day
    copies of ONE viral template page — the mega-duplicated hot
    content-hash that wedges a window-based exact-dup into a single
    sorting task. Used by the skew tests and the skew bench run to
    show the aggregate+join verdict stays balanced.
    """
    rng = random.Random(seed)
    rows = []
    viral_text = None
    viral_ts = None
    if dup_frac > 0:
        vrng = random.Random(seed ^ 0x5EED)
        viral_text = "\n\n".join(
            gen_sentence("en", vrng, min_w=20, max_w=40)
            for _ in range(4))
        viral_ts = _EPOCH + dt.timedelta(days=3, hours=7)
    # pool for exact_dup class: (text, warc_ts) — duplicates are
    # same-day mirrors (the pipeline's exact-dup scope is the crawl day)
    clean_texts: list[tuple[str, dt.datetime]] = []
    for i in range(n):
        if viral_text is not None and rng.random() < dup_frac:
            # verbatim same-day copy of the one viral template page
            paras = viral_text.split("\n\n")
            rows.append((f"https://viral.example.com/{seed}/{i:07d}",
                         viral_ts, _paragraphs_to_html(paras),
                         viral_text, "en"))
            continue
        lang = rng.choices(LANGS, weights=[55, 15, 15, 15])[0]
        claimed = lang
        domain = _pick_domain(rng)
        url = f"https://{domain}/page/{seed}/{i:07d}"
        ts = _EPOCH + dt.timedelta(
            seconds=rng.randint(0, 30 * 24 * 3600 - 1))
        u = rng.random()

        n_paras = rng.randint(2, 6)
        paras = [
            gen_sentence(lang, rng, min_w=15, max_w=45)
            for _ in range(n_paras)
        ]

        if u < 0.04:  # too_short
            paras = [" ".join(paras[0].split(" ")[: rng.randint(3, 10)])]
        elif u < 0.08:  # symbol_heavy
            junk = " ".join(
                rng.choice(["###", "...", "#tag", "## ##"])
                for _ in range(30))
            paras = [p + " " + junk for p in paras]
        elif u < 0.12:  # low_stopword: content-only words
            paras = [
                gen_sentence(lang, rng, min_w=25, max_w=50,
                             stopword_rate=0.0)
                for _ in range(n_paras)
            ]
        elif u < 0.17:  # repetitive
            line = gen_sentence(lang, rng, min_w=8, max_w=12)
            paras = [line] * rng.randint(6, 12)
        elif u < 0.22 and clean_texts:  # exact_dup (same-day mirror)
            text, ts = rng.choice(clean_texts)
            paras = text.split("\n\n")
        elif u < 0.25:  # gibberish
            paras = [gibberish_sentence(rng, n=rng.randint(20, 40))
                     for _ in range(n_paras)]
        else:  # clean (+ overlays)
            if rng.random() < 0.10:  # wrong_lang
                claimed = rng.choice([l for l in LANGS if l != lang])
            if rng.random() < 0.12:
                paras = _inject_pii(paras, rng)
            if rng.random() < 0.06:
                paras = _inject_toxicity(paras, rng)

        text = "\n\n".join(paras)
        if 0.17 <= u < 0.22 and clean_texts:
            pass  # exact_dup: keep copied text + same-day ts verbatim
        elif u >= 0.25:
            clean_texts.append((text, ts))

        html = _paragraphs_to_html(paras)
        if u >= 0.25 and rng.random() < 0.02:  # bad_html overlay
            html = html[: max(10, len(html) // 2)]

        rows.append((url, ts, html, text, claimed))

    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"])


def write_pages_parquet(path: str, n: int = 2000, seed: int = 42,
                        n_files: int = 1, dup_frac: float = 0.0) -> str:
    """Write the pages fixture. ``n_files > 1`` writes a directory of
    part files — the realistic shape of a crawl table, and what lets a
    local-mode scan fan out across all cores without a repartition."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = make_pages(n, seed, dup_frac=dup_frac)
    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])

    def _write(frame, target):
        pq.write_table(pa.Table.from_pandas(frame, schema=schema,
                                            preserve_index=False), target,
                       row_group_size=1024)

    if n_files <= 1:
        _write(pdf, path)
        return path
    os.makedirs(path, exist_ok=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = pdf.iloc[i * step:(i + 1) * step]
        if len(chunk):
            _write(chunk, os.path.join(path, f"part-{i:04d}.parquet"))
    return path

"""Adversarial-data fuzz gate: the 253 Spark-vs-DuckDB oracle pairs have
only ever been compared on the ONE driver dataset (seed=42, benign
distributions). This gate regenerates the three content tables (events /
documents / embeddings) under adversarial profiles — heavy ties,
degenerate/tiny groups, extreme magnitudes + monotone series, unicode
text — writes them with the EXACT physical schema of the driver files,
and replays the full tools/check.py comparison per profile in a fresh
subprocess (fresh session caches, honest per-profile isolation).

A divergence here is a real robustness finding: both engines read the
same parquet, so any FAIL is the engines disagreeing on semantics the
driver data never exercised (tie-breaking, 0/0 windows, empty token
sets, unicode regex classes, fixed-point overflow).

Usage:
    python tools/fuzz_gate.py [--profiles ties,tiny,...] [--keys k1 k2]
                              [--out FUZZ.json] [--keep]

Profiles are seed-deterministic; re-running reproduces byte-identical
inputs (modulo parquet writer metadata).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_SF = "/root/testdata/sf0.001"  # schema + passthrough-table source

EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]
LANGS = ["en", "de", "es", "fr", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
DIM = 64

WORDS = (
    "key agg row scan slow fast table value part hash merge batch filter "
    "join sort spill shuffle column index stream window frame group order "
    "plan stage task node core disk memory cache block page byte".split()
)


def _write_like(driver_table: str, out_path: str, table: pa.Table) -> None:
    """Write `table` cast to the driver file's exact physical schema —
    the comparison must test semantics, not writer-type drift."""
    ref = pq.read_schema(os.path.join(DRIVER_SF, f"{driver_table}.parquet"))
    cast = table.select(ref.names).cast(ref)
    pq.write_table(cast, out_path)


def _events(rng, n, ts_us, user_id, event_type, value, props=None):
    assert len(ts_us) == n
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us.astype("datetime64[us]")),
        "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
        "event_type": pa.array(list(event_type)),
        "value": pa.array(np.asarray(value, dtype=np.float64)),
        "props": pa.array(
            props if props is not None
            else ['{"k": %d}' % k for k in rng.integers(0, 100, n)]),
    })


def _documents(texts, langs, sources):
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def _embeddings(vecs, labels):
    return pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([np.asarray(v, dtype=np.float32) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels, dtype=np.int32)),
    })


def _sentence(rng, n_words):
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n_words))


# --------------------------------------------------------------- profiles ----

def gen_ties(d: str, rng) -> None:
    """Heavy duplication: minute-quantized timestamps (hundreds of events
    per instant), constant and two-valued price series, exact-dup and
    one-token-near-dup documents, identical + all-zero embeddings.
    Stresses: window tie-breaking, 0/0 warmups (RSI/stoch on constant
    series), LSH bucket blowup on identical signatures, zero-norm
    cosine."""
    n = 6000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # 3 days of whole minutes, each minute drawn by MANY events
    ts = base + (rng.integers(0, 3 * 24 * 60, n) * 60_000_000).astype(
        "timedelta64[us]")
    ts.sort()
    et = [EVENT_TYPES[i] for i in rng.integers(0, 5, n)]
    value = rng.uniform(1, 100, n).round(2)
    for i, t in enumerate(et):
        if t == "view":
            value[i] = 100.0           # constant series
        elif t == "click":
            value[i] = 1.0 + (i % 2)   # two-valued ties
    _write_like("events", f"{d}/events.parquet",
                _events(rng, n, ts, rng.integers(0, 20, n), et, value))

    texts, langs, srcs = [], [], []
    dup = _sentence(rng, 40)
    for i in range(300):
        if i < 100:
            t = dup                               # exact dups
        elif i < 150:
            t = dup + " " + WORDS[i % len(WORDS)]  # near-dups
        elif i < 180:
            t = ("spam " * 50).strip()             # one repeated token
        else:
            t = _sentence(rng, int(rng.integers(30, 80)))
        texts.append(t)
        langs.append(LANGS[i % 5])
        srcs.append(SOURCES[i % 20])
    _write_like("documents", f"{d}/documents.parquet",
                _documents(texts, langs, srcs))

    vecs = []
    proto = rng.normal(0, 1, DIM)
    for i in range(200):
        if i < 50:
            vecs.append(proto)                    # identical
        elif i < 80:
            vecs.append(np.zeros(DIM))            # zero-norm
        else:
            vecs.append(rng.normal(0, 1, DIM))
    _write_like("embeddings", f"{d}/embeddings.parquet",
                _embeddings(vecs, [i % 10 for i in range(200)]))


def gen_tiny(d: str, rng) -> None:
    """Degenerate cardinalities: one event type with a SINGLE row,
    single-event users, multi-day gaps (gapfill/sessionize edges),
    single-token and single-character documents, a single doc per
    (lang, source) cell, barely-enough vectors for IVF/PQ training."""
    n = 60
    base = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = np.cumsum(rng.integers(1, 4 * 24 * 3600, n))  # up to 4-day gaps
    ts = base + (gaps * 1_000_000).astype("timedelta64[us]")
    et = ["signup"] + [EVENT_TYPES[i % 4] for i in range(n - 1)]  # signup x1
    users = np.arange(n) % 7
    users[0] = 99                                   # single-event user
    value = rng.uniform(0.01, 1e6, n).round(2)
    _write_like("events", f"{d}/events.parquet",
                _events(rng, n, ts, users, et, value))

    texts = ["a", "word", "two words", ". , ; :", "x " * 1 + "y",
             _sentence(rng, 5), _sentence(rng, 500),
             "tab\tand\nnewline separated", "UPPER CASE ONLY WORDS",
             "1 2 3 4 5 6 7 8 9 10", "repeat repeat", _sentence(rng, 48)]
    langs = [LANGS[i % 5] for i in range(len(texts))]
    srcs = [SOURCES[i] for i in range(len(texts))]
    _write_like("documents", f"{d}/documents.parquet",
                _documents(texts, langs, srcs))

    vecs = [rng.normal(0, 1, DIM) for _ in range(40)]
    _write_like("embeddings", f"{d}/embeddings.parquet",
                _embeddings(vecs, [i % 3 for i in range(40)]))


def _extreme_events(d: str, rng, hi: float, lo: float,
                    tiny: float | None = None) -> None:
    n = 4000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (np.arange(n, dtype=np.int64) * 137_000_000 +
                 rng.integers(0, 1000, n) * 1000).astype("timedelta64[us]")
    et = [EVENT_TYPES[i] for i in rng.integers(0, 5, n)]
    value = np.empty(n)
    inc = dec = 0
    for i, t in enumerate(et):
        if t == "view":
            inc += 1
            value[i] = float(inc)                    # strictly increasing
        elif t == "error":
            dec += 1
            value[i] = hi - dec                      # strictly decreasing
        elif t == "click":
            value[i] = hi if i % 2 else lo           # magnitude whiplash
        elif t == "purchase":
            value[i] = hi + (i % 97)                 # cents-sum stress
        else:
            value[i] = tiny if tiny is not None else lo  # constant tiny
    _write_like("events", f"{d}/events.parquet",
                _events(rng, n, ts, rng.integers(0, 150, n), et, value))


def gen_extreme(d: str, rng) -> None:
    """Domain-boundary magnitudes + monotone series: strictly increasing
    / decreasing prices (aroon/psar/drawdown edges), whiplash between
    the engine's documented VALUE DOMAIN edges (|v| <= 1e6, resolution
    >= 1e-4 — the envelope where the 1e-6 comparison grid sits safely
    above double ulp and the fixed-point quantizers cannot overflow),
    constant-tiny series; giant and single-giant-token documents; 1e6 /
    1e-8 magnitude embeddings and one dominant axis. Failures here are
    REAL bugs. The non-gating `beyond` profile pushes past the domain.

    The whiplash ratio is capped at 1e6 (1.0 <-> 1e6): the domain also
    bounds INTRA-SERIES dynamic range, because %-scaled outputs (ROC
    and friends) multiply it by 100 — a 1e10 ratio makes outputs ~1e12
    whose double ulp (2.4e-4) swallows the 1e-6 comparison grid. The
    constant-tiny 1e-4 series exercises the low edge on its own
    symbol."""
    _extreme_events(d, rng, hi=1e6, lo=1.0, tiny=1e-4)

    _extreme_docs_vecs(d, rng)


def gen_beyond(d: str, rng) -> None:
    """BEYOND-domain exploratory profile (non-gating): 1e-9..1e9 price
    magnitudes. Out here the 1e-6 absolute comparison grid drops below
    double ulp (ulp(1e9) ~ 1.2e-7 per op, and error compounds through
    indicator chains), so ANY two engines — or two summation orders on
    one engine — legitimately disagree in the grid's last digit. Diffs
    are recorded for observability; they do not count as failures.
    Genuine crashes/overflows DO still surface here (the 128-bit cumsum
    widening came from this profile's 1e28 PVT terms)."""
    _extreme_events(d, rng, hi=1e9, lo=1e-9)
    _extreme_docs_vecs(d, rng)


def _extreme_docs_vecs(d: str, rng) -> None:
    texts = []
    for i in range(120):
        if i == 0:
            texts.append(_sentence(rng, 4000))       # ~20k chars
        elif i == 1:
            texts.append("x" * 4096)                 # one giant token
        elif i == 2:
            texts.append(("z" * 500 + " ") * 8)      # few giant tokens
        else:
            texts.append(_sentence(rng, int(rng.integers(20, 120))))
    _write_like("documents", f"{d}/documents.parquet",
                _documents(texts, [LANGS[i % 5] for i in range(120)],
                           [SOURCES[i % 20] for i in range(120)]))

    vecs = []
    for i in range(150):
        v = rng.normal(0, 1, DIM)
        if i < 30:
            v = v * 1e6
        elif i < 60:
            v = v * 1e-8
        elif i < 70:
            v[0] = 1e7                               # dominant axis
        vecs.append(v)
    _write_like("embeddings", f"{d}/embeddings.parquet",
                _embeddings(vecs, [i % 10 for i in range(150)]))


def gen_unicode(d: str, rng) -> None:
    """Unicode text: CJK without spaces (one giant 'token'), emoji,
    combining accents, RTL, punctuation-only docs, curly quotes,
    zero-width joiners — the regex/length semantics most likely to
    diverge between Spark's JVM regex and DuckDB's RE2-style engine.
    Events stay benign (text is the target)."""
    n = 2000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (np.cumsum(rng.integers(1, 300, n)) * 1_000_000).astype(
        "timedelta64[us]")
    _write_like("events", f"{d}/events.parquet",
                _events(rng, n, ts, rng.integers(0, 50, n),
                        [EVENT_TYPES[i] for i in rng.integers(0, 5, n)],
                        rng.uniform(1, 500, n).round(2)))

    uni = [
        "数据处理引擎在大规模语料上运行去重与相似度检索任务",
        "机器学习 模型 训练 需要 高质量 的 语料",
        "🚀🚀🚀 emoji only doc 🎉 🧪 🔬",
        "café résumé naïve coöperate São Paulo Zürich",
        "é combining accent à grave",
        "مرحبا بالعالم هذا نص عربي للاختبار",
        "Привет мир это русский текст для теста",
        "!!! ??? ... ;;; ::: --- ===",
        "“curly quotes” and ‘single’ and em—dash",
        "zero​width​space and zwj‍ joined",
        "ＦＵＬＬＷＩＤＴＨ ＬＡＴＩＮ ＴＥＸＴ",
        "mixed 中文 and english tokens in one 文档 here",
    ]
    texts, langs, srcs = [], [], []
    for i in range(240):
        if i < len(uni) * 3:
            texts.append(uni[i % len(uni)])
        else:
            texts.append(_sentence(rng, int(rng.integers(20, 100))))
        langs.append(LANGS[i % 5])
        srcs.append(SOURCES[i % 20])
    _write_like("documents", f"{d}/documents.parquet",
                _documents(texts, langs, srcs))

    vecs = [rng.normal(0, 1, DIM) for _ in range(120)]
    _write_like("embeddings", f"{d}/embeddings.parquet",
                _embeddings(vecs, [i % 10 for i in range(120)]))


PROFILES = {
    "ties": gen_ties,
    "tiny": gen_tiny,
    "extreme": gen_extreme,
    "unicode": gen_unicode,
}

# run + record, but do not gate: out-of-domain magnitudes (see
# gen_beyond docstring)
EXPLORATORY = {"beyond": gen_beyond}

_LINE = re.compile(r"^(OK|FAIL|ok\?)\s+(\S+?):?\s+(.*)$")


def run_profile(name: str, gen, keys: list[str], keep: bool,
                seed: int = 0) -> dict:
    import zlib

    d = tempfile.mkdtemp(prefix=f"pts_fuzz_{name}_")
    # crc32, not hash(): str hash is salted per process (PYTHONHASHSEED),
    # which silently made every run a different dataset. --seed N shifts
    # every profile to a fresh deterministic draw — divergences can be
    # draw-dependent (the aobv flat-stretch flag flip appeared on 1 of
    # 41 event draws), so sweeps across seeds widen coverage while each
    # (profile, seed) stays exactly reproducible.
    rng = np.random.default_rng(zlib.crc32(name.encode()) + seed)
    gen(d, rng)
    # passthrough tables the suite doesn't fuzz (orders feeds only the
    # alternate bars derivation; region..lineitem are view-registration
    # requirements of check.py)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(os.path.join(DRIVER_SF, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))
    env = dict(os.environ, CHECK_SF_DIR=d)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), *keys],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=5400)
    out = {"ok": 0, "fail": 0, "rows_only": 0, "failures": {},
           "wall_s": round(time.time() - t0, 1), "dir": d if keep else None}
    for line in proc.stdout.splitlines():
        m = _LINE.match(line.strip())
        if not m:
            continue
        tag, key, msg = m.groups()
        if tag == "OK":
            out["ok"] += 1
        elif tag == "ok?":
            out["rows_only"] += 1
        else:
            out["fail"] += 1
            out["failures"][key] = msg[:500]
    if proc.returncode not in (0, 1):
        out["crash"] = (proc.stderr or proc.stdout)[-2000:]
    # ONE retry for session-infrastructure crashes (Py4J gateway /
    # collectToPython deaths): the r13 seed-2 tiny sweep recorded 7
    # false FAILs that were JVM-session casualties, not value
    # divergences — a fresh single-slice process adjudicates them.
    infra = [k for k, m in out["failures"].items()
             if m.startswith("spark error:") and any(
                 s in m for s in ("Py4J", "EOF", "Connection",
                                  "JavaGateway", "JVM"))]
    if infra:
        rp = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check.py"),
             *infra],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=5400)
        out["infra_retried"] = {}
        for line in rp.stdout.splitlines():
            m = _LINE.match(line.strip())
            if not m or m.group(2) not in infra:
                continue
            tag, key, msg = m.groups()
            out["infra_retried"][key] = tag
            if tag == "OK":
                out["ok"] += 1
                out["fail"] -= 1
                out["failures"].pop(key, None)
            else:  # still failing in a fresh session: keep, update msg
                out["failures"][key] = msg[:500]
    if out["failures"]:
        _reexamine(d, out)
    if not keep:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _reexamine(d: str, out: dict) -> None:
    """Downgrade failures whose every diff is beyond-grid ulp drift
    (tools/fuzz_reexamine.py) to recorded-but-non-gating."""
    # engine/oracle ERRORS are never ulp drift — only value mismatches
    keys = [k for k, m in out["failures"].items() if " error:" not in m]
    if not keys:
        return
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "fuzz_reexamine.py"),
             d, *keys],
            capture_output=True, text=True, timeout=1800, cwd=REPO)
    except subprocess.TimeoutExpired:
        return
    out["ulp_drift"] = {}
    out["grid_edge"] = {}
    for line in proc.stdout.splitlines():
        if not line.startswith("REEXAMINE "):
            continue
        r = json.loads(line[len("REEXAMINE "):])
        v = r.get("verdict")
        if v in ("ulp_drift", "grid_edge"):
            k = r["key"]
            out[v][k] = {
                "n_diffs": r["n_diffs"],
                "n_grid_edge": r.get("n_grid_edge", 0),
                "worst_rel": r["worst_rel"],
                "msg": out["failures"].pop(k)}
            out["fail"] -= 1


def main(argv: list[str]) -> int:
    profiles = list(PROFILES)
    keys: list[str] = []
    out_path = os.path.join(REPO, "FUZZ.json")
    keep = False
    skip_exploratory = False
    seed = 0
    it = iter(argv)
    for a in it:
        if a == "--profiles":
            profiles = next(it).split(",")
            skip_exploratory = True  # explicit list: run exactly it
        elif a == "--out":
            out_path = next(it)
        elif a == "--keep":
            keep = True
        elif a == "--no-beyond":
            skip_exploratory = True
        elif a == "--seed":
            seed = int(next(it))
        else:
            keys.append(a)
    report = {"profiles": {}, "total_fail": 0, "exploratory": {},
              "seed": seed}
    gens = dict(PROFILES, **EXPLORATORY)
    if not skip_exploratory:
        profiles = profiles + list(EXPLORATORY)
    for p in profiles:
        gating = p not in EXPLORATORY
        print(f"=== profile {p}{'' if gating else ' (non-gating)'}",
              flush=True)
        r = run_profile(p, gens[p], keys, keep, seed)
        (report["profiles"] if gating else report["exploratory"])[p] = r
        if gating:
            report["total_fail"] += r["fail"]
        print(f"    {r['ok']} ok, {r['fail']} fail, "
              f"{r['rows_only']} rows-only, "
              f"{len(r.get('ulp_drift', {}))} ulp-drift ({r['wall_s']}s)",
              flush=True)
        for k, msg in r["failures"].items():
            print(f"    {'FAIL' if gating else 'drift'} {k}: {msg[:200]}",
                  flush=True)
        for k, info in r.get("ulp_drift", {}).items():
            print(f"    ulp  {k}: {info['n_diffs']} beyond-grid diffs,"
                  f" worst_rel {info['worst_rel']:.2e}", flush=True)
        for k, info in r.get("grid_edge", {}).items():
            print(f"    edge {k}: {info['n_grid_edge']} half-grid-boundary"
                  f" rows (of {info['n_diffs']} diffs)", flush=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"metric": "fuzz_gate_failures",
                      "value": report["total_fail"],
                      "profiles": {p: r["fail"]
                                   for p, r in report["profiles"].items()},
                      # downgraded-but-real value differences stay visible
                      # in the exit summary (ADVICE r11): a regression that
                      # hides inside the grid_edge rate budget is noticed
                      # here, not just in the per-profile logs
                      "grid_edge_keys": {
                          p: sorted(r.get("grid_edge", {}))
                          for p, r in report["profiles"].items()
                          if r.get("grid_edge")},
                      "beyond_domain_drift": {
                          p: r["fail"]
                          for p, r in report["exploratory"].items()}}))
    return 1 if report["total_fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

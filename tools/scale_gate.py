"""Repeatable beyond-gate scale check: the pinned scale-sensitive key
list vs DuckDB on an Nx replica of an sf dir.

    python tools/scale_gate.py [--n 100] [--sf-dir /root/testdata/sf0.01] [key ...]

Builds the replica via tools/make_x10.py if the target dir is absent,
then runs tools/check.py (the driver-style exact value-hash gate) over
SCALE_KEYS (or an explicit key subset). The list is the r10 x100 pass
set: every fixed-point/overflow class (the microstructure/risk pack,
kyle's KYLE_VOL_MAX cap, the HUGEINT dtype keys), the dedup/similarity
join classes (banded LSH, pointer-jumping CC, IVF/IVF-PQ), 1M-event
behavior skew, and the flagship anchors. These are the queries where
scale-DEPENDENT divergence has actually bitten (BETA_SCALE r6, dtype
r8, second-moment overflow + LSH fan-out + CC diameter r10).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SCALE_KEYS = [
    # microstructure/risk: fixed-point + DECIMAL(38,0)/HUGEINT classes
    "vol_parkinson_20", "vol_garman_klass_20", "vol_rogers_satchell_20",
    "vol_yang_zhang_20", "amihud_illiq_20", "cs_spread_2_20",
    "roll_spread_20", "hurst_aggvar", "ar1_half_life",
    "rolling_sharpe_20", "rolling_sortino_20", "var_cvar_95_100",
    "rolling_mdd_100", "kyle_lambda_20", "rolling_beta_24",
    "lead_lag_corr_1h", "pair_spread_z_24",
    # dtype / LM statistics (HUGEINT vs BIGINT folds)
    "lang_source_agg", "events_props_agg", "token_count_bpe",
    "perplexity_bigram", "unigram_kl_by_source",
    # dedup / contamination (banded LSH, span explode, CC rounds)
    "dedup_minhash_lsh", "dedup_cc_clusters", "dedup_spans",
    "contamination_prefix", "contamination_minhash",
    "neardup_cosine_lsh", "semdedup_keep", "semdedup_cc_clusters",
    # ANN index build/probe at Nx corpus
    "topk_cosine_ivf", "topk_cosine_ivfpq",
    # behavior skew over Nx events
    "session_stats_30m", "retention_cohorts", "event_transition_matrix",
    "active_users_daily", "user_rfm_segments",
    # window recursion anchors + long-window + chunking
    "supertrend_7", "macd_12_26_9", "sma_200_large",
    "doc_chunk_128_16", "chunk_dup_rate",
]


def main() -> int:
    args = sys.argv[1:]
    n = 100
    sf_dir = "/root/testdata/sf0.01"
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1
    base = os.path.basename(sf_dir.rstrip("/"))
    rep_dir = f"/tmp/sfx{n}_{base}"
    if not os.path.isdir(rep_dir):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "make_x10.py"),
             sf_dir, str(n)], check=True)
    env = dict(os.environ, CHECK_SF_DIR=rep_dir)
    rc = 0
    todo = keys or SCALE_KEYS
    # chunked: one long-lived gate process per slice keeps peak memory
    # bounded and a slow key from starving the rest of a single timeout
    for lo in range(0, len(todo), 8):
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "check.py"),
             *todo[lo:lo + 8]], env=env)
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())

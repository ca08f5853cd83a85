#!/usr/bin/env bash
# Guarded sf0.1 oracle sweep of the EXACT-arithmetic gates (r13 verdict #7).
#
# Gates verify at sf0.01 each round; the recurring historical failure class
# is oracle TYPING that only bites at larger counts (DuckDB promoting an
# integer sum to HUGEINT while the engine stays int64, decimal widths,
# date-boundary rollover). This sweep re-runs the cheap exact-arithmetic
# gates — integer counts, decimal sums, set semantics — at sf0.1 against
# the same DuckDB oracle, so scale-dependent oracle drift is caught every
# round without paying the full verify at 10x volume.
#
# Usage: tools/sweep_sf01.sh [out_artifact]     (default SWEEP_sf01.txt)
#   SPARK_GRAFT_SWEEP_SF overrides the data dir.
# Skip by simply not running it; the driver contract is untouched.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-SWEEP_sf01.txt}
SF=${SPARK_GRAFT_SWEEP_SF:-/root/testdata/sf0.1}
TMP=$(mktemp -d /tmp/graft_sweep.XXXXXX)
trap 'rm -rf "$TMP"' EXIT

# exact-arithmetic gate prefixes: counts, decimal sums, set ops, packing
# arithmetic, model rollups — the surfaces where a type promotion or an
# off-by-one at 10x volume changes the hash
PREFIXES="q1_,q6_,rel_join,rel_semi_join,rel_anti_join,rel_distinct,rel_grouping_sets,rel_cube,rel_setops,rel_topk,rel_window,rel_pivot,rel_unpivot,rel_funnel,rel_retention,pipe_dedup_exact,pipe_dedup_fingerprint,pipe_sample,pipe_shard_assign,pipe_pack,pipe_split,pipe_corpus,olap_rollup,olap_multiparent,olap_area_records,olap_area_stats,olap_grid_dense,olap_import_named,olap_bucketed_read,olap_partitioned_read,olap_zordered,olap_zstore_asof,pipe_multimodal_probe,pipe_zorder_timetravel"

# gates whose ORACLE is super-linear at sf0.1 — EMPTY since round 15: the
# clusters CTE's all-pairs reachability closure (the one excluded oracle,
# pipe_split_safe) was rewritten as min-label propagation, linear in the
# cluster structure, and now runs at sf0.1 (~70 s) like every other gate
EXCLUDE=""

echo "[sweep] verify at $SF (prefixes: $PREFIXES)" >&2
sbt -batch "runMain graft.Verify $SF $TMP $PREFIXES" 2>&1 \
  | grep -E "\[verify\].*failed|Exception in" >&2 || true
for g in $EXCLUDE; do rm -rf "$TMP/$g"; done
python3 tools/check.py "$SF" "$TMP" | tee "$OUT"

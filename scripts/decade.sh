#!/bin/bash
# SURVEY §6 decade measurement runner (r17): GenScale corpora + ScaleBench
# outside sbt (direct java against compiled classes) so the long decade
# points don't hold the sbt lock. Mirrors build.sbt's fork JVM options.
set -euo pipefail
cd /root/repo

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/root/repo/target/decade-classes:/opt/spark/jars/*"
BASE="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

run_main() { # heap, pretouch(0/1), main, args...
  local heap="$1" pretouch="$2" main="$3"; shift 3
  local extra=""
  [ "$pretouch" = "1" ] && extra="-Xms$heap -XX:+AlwaysPreTouch"
  # shellcheck disable=SC2086
  java $ADD_OPENS $BASE -Xmx"$heap" $extra -cp "$CP" "$main" "$@"
}

case "${1:-all}" in
  gen50k)  run_main 16g 0 graft.tools.GenScale target/testdata/sf1 50000 20000 ;;
  gen500k) run_main 32g 0 graft.tools.GenScale target/testdata/sf10 500000 200000 ;;
  bench50k)
    run_main 96g 1 graft.tools.ScaleBench target/testdata/sf1 \
      "q_dedup_jaccard_prefix,q_dedup_clusters,q_dedup_containment,q_substr_dedup,q_cluster_delta,q_knn_graph" ;;
  bench500k)
    # One JVM PER QUERY: the 500k shuffle/spill outputs of six queries
    # do not fit the ~80 GB effective disk in one session (the
    # ContextCleaner only reclaims shuffle files when the dependency is
    # GC'd, and a pinned 96g heap may never GC) — per-query JVMs bound
    # live disk to one query's passes and die with their temp dirs.
    # q_dedup_containment is NOT in this loop: its candidate stream
    # (~5x jaccard volume) needs single-pass no-warmup mode even alone —
    # run `decade.sh cont500k` separately on an otherwise-empty disk.
    fail=0
    for q in q_dedup_jaccard_prefix q_dedup_clusters \
             q_substr_dedup q_cluster_delta q_knn_graph; do
      echo "=== $q ==="
      run_main 96g 1 graft.tools.ScaleBench target/testdata/sf10 "$q" \
        || { echo "FAILED $q"; fail=1; }
    done
    exit $fail ;;
  cont500k)
    # The containment 500k point, single-pass protocol: one timed pass,
    # no warmup, so live shuffle/spill stays within the sandbox disk
    # (warmup+2-pass mode exhausted it — see the r17 round notes).
    SPARK_GRAFT_TIMED_PASSES=1 SPARK_GRAFT_WARMUP=0 \
      run_main 96g 1 graft.tools.ScaleBench target/testdata/sf10 \
        q_dedup_containment ;;
  *) echo "usage: decade.sh gen50k|gen500k|bench50k|bench500k|cont500k"; exit 2 ;;
esac

#!/usr/bin/env bash
# spark-submit --py-files deployment smoke (north_rule deployment mode).
#
# Proves the package runs under a real spark-submit launch with ALL
# imports resolved from the shipped zip, not the repo checkout: the
# entry script is copied to /tmp (its repo-relative sys.path insert
# then points nowhere useful) and driven from there, so a py-files
# shipping bug fails loudly with ModuleNotFoundError.
#
# Usage: bash bin/spark_submit_smoke.sh [sf_dir] [master]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
MASTER="${2:-local[8]}"
SUBMIT="$(command -v spark-submit || echo /opt/spark/bin/spark-submit)"
OUT="$(mktemp -d /tmp/submit_smoke.XXXXXX)"

ZIP="$(python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from ragflow_spark.deploy import package_zip
print(package_zip())
EOF
)"

cp "$REPO/bin/run_extract.py" "$OUT/job.py"
"$SUBMIT" --master "$MASTER" --py-files "$ZIP" "$OUT/job.py" \
  --input "synth:$SF_DIR" --output "$OUT/run" --run-id submit-smoke \
  --n-splits 16 --wave-size 16 --cores 8

# cross-check against an in-process run of the same input
python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from ragflow_spark.session import get_spark
spark = get_spark(cores=8, shuffle_partitions=8)
sub = {
    r["url"]: (r["extracted_text"], r["parse_code"])
    for r in spark.read.parquet("$OUT/run/extracted").collect()
}
from ragflow_spark.sources.pages import synthesize_pages
from ragflow_spark.plans.pipeline import assign_splits, extract_pages
ex = extract_pages(assign_splits(synthesize_pages(spark, "$SF_DIR"), 16, 8, None))
ref = {
    r["url"]: (r["extracted_text"], r["parse_code"])
    for r in ex.select("url", "extracted_text", "parse_code").collect()
}
assert sub == ref, "spark-submit output diverges from in-process run"
print(f"SUBMIT-SMOKE OK: {len(sub)} docs byte-identical via --py-files")
EOF
rm -rf "$OUT"

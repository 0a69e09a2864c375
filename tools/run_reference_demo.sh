#!/usr/bin/env bash
# Drop-in compatibility demo: run the CLI triple against the reference's OWN
# sample data and UNMODIFIED per-dataset config files (read in place from
# /root/reference — never copied into this repo):
#   1. collect-to-cleanse of syntheticlife claim + policy CSVs
#      (mapping CSV + transformation-spec JSON + dq-rules JSON verbatim)
#   2. cleanse-to-consume with the reference's spark-*.sql verbatim
# A reference user's config directory carries over unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

REF=/root/reference
DEMO=/tmp/graft_refdemo
rm -rf "$DEMO"
mkdir -p "$DEMO/lookups"
export GRAFT_WAREHOUSE="$DEMO/wh"
export GRAFT_LINEAGE_FILE="$DEMO/lineage.jsonl"

# the reference seeds its DynamoDB lookup table from one JSON of
# {name: {orig: new}}; our directory store wants one <name>.json per lookup
python3 - <<EOF
import json
d = json.load(open("$REF/resources/syntheticlife_lookup_data.json"))
for name, mapping in d.items():
    json.dump(mapping, open("$DEMO/lookups/%s.json" % name, "w"))
EOF

SPEC=$REF/lib/glue_scripts/transformation-spec
DQ=$REF/lib/glue_scripts/dq-rules

sbt -batch "runMain graft.RunPipeline $REF/resources/syntheticlife-claim-data.csv \
  $SPEC/SyntheticLifeData-ClaimData.json syntheticlifedata claimdata \
  $SPEC/SyntheticLifeData-ClaimData.csv - - 2023-01-01" 2>&1 | grep '\[graft\]'

sbt -batch "runMain graft.RunPipeline $REF/resources/syntheticlife-policy-data.csv \
  $SPEC/SyntheticLifeData-PolicyData.json syntheticlifedata policydata \
  $SPEC/SyntheticLifeData-PolicyData.csv $DQ/dq-SyntheticLifeData-PolicyData.json \
  $DEMO/lookups 2023-01-01" 2>&1 | grep '\[graft\]'

sbt -batch "runMain graft.RunConsume \
  $REF/lib/glue_scripts/transformation-sql/spark-SyntheticLifeData-PolicyData.sql \
  syntheticlifedata policydata $DQ/dq-SyntheticLifeData-PolicyData.json" 2>&1 | grep '\[graft\]'

# Excel leg: the reference's quickstart data ARRIVES as spreadsheets — prove
# the same claim config ingests a real .xlsx (claim CSV re-materialized as a
# workbook, read by the native XLSX source) with identical row counts
sbt -batch "runMain graft.CsvToXlsx $REF/resources/syntheticlife-claim-data.csv \
  $DEMO/syntheticlife-claim-data.xlsx" 2>&1 | grep '\[graft\]'
sbt -batch "runMain graft.RunPipeline $DEMO/syntheticlife-claim-data.xlsx \
  $SPEC/SyntheticLifeData-ClaimData.json syntheticlifedata claimdata_xlsx \
  $SPEC/SyntheticLifeData-ClaimData.csv - - 2023-01-01" 2>&1 | grep '\[graft\]'

# second dataset family: general insurance (tokenize -> token store, redact,
# merge, its own dq + consume SQL), same verbatim configs
python3 - <<PYEOF
import json
d = json.load(open("$REF/resources/syntheticgeneral_lookup_data.json"))
for name, mapping in d.items():
    json.dump(mapping, open("$DEMO/lookups/%s.json" % name, "w"))
PYEOF
export GRAFT_TOKEN_STORE="$DEMO/token_store"

# written policies: the premium showcase (lookup, enddate, policymonths,
# expandpolicymonths, earnedpremium, flipsign, combinecolumns) + its consume
# SQL and the Athena view passthrough, configs verbatim
sbt -batch "runMain graft.RunPipeline $REF/resources/syntheticgeneral-writtenpolicies.csv \
  $SPEC/SyntheticGeneralData-WrittenPolicyData.json syntheticgeneraldata writtenpolicydata \
  $SPEC/SyntheticGeneralData-WrittenPolicyData.csv - $DEMO/lookups 2023-01-01" 2>&1 | grep '\[graft\]'

sbt -batch "runMain graft.RunConsume \
  $REF/lib/glue_scripts/transformation-sql/spark-SyntheticGeneralData-WrittenPolicyData.sql \
  syntheticgeneraldata writtenpolicydata - \
  $REF/lib/glue_scripts/transformation-sql/athena-SyntheticGeneralData-WrittenPolicyData.sql" 2>&1 | grep '\[graft\]'

# nested policies: JSON source + jsonexpandarray/jsonexpandmap + month expand
sbt -batch "runMain graft.RunPipeline $REF/resources/syntheticgeneral-nested-policies.json \
  $SPEC/SyntheticGeneralData-NestedPolicyData.json syntheticgeneraldata nestedpolicydata \
  $SPEC/SyntheticGeneralData-NestedPolicyData.csv - - 2023-01-01" 2>&1 | grep '\[graft\]'

# entity-match family: two source systems over two days — cleanse + consume
# per file, then the match job (exact on (customerno, srcsystemid), leveled
# fuzzy with slice-markup blocking, uuid-fill, MERGE upsert) against the
# shared primary table, configs verbatim
SQL=$REF/lib/glue_scripts/transformation-sql
em() { # <csv> <specBase> <table>
  sbt -batch "runMain graft.RunPipeline $REF/resources/$1 \
    $SPEC/$2.json customer $3 $SPEC/$2.csv - - $4" 2>&1 | grep '\[graft\]'
  sbt -batch "runMain graft.RunConsume $SQL/spark-$2.sql customer $3" 2>&1 | grep '\[graft\]'
  sbt -batch "runMain graft.RunEntityMatch $SPEC/Customer-entitymatch.json \
    customer_consume.$3" 2>&1 | grep '\[graft\]'
}
em customer_A01_entitymatch_day1.csv Customer-A01 a01 2023-01-01
em customer_A01_entitymatch_day2.csv Customer-A01 a01 2023-01-02
em customer_C25_entitymatch_day1.csv Customer-C25 c25 2023-01-01

echo "[demo] done — tables under $GRAFT_WAREHOUSE, lineage in $GRAFT_LINEAGE_FILE"

#!/bin/sh
# CI-style packaging proof: publish the library locally, then build
# and run the standalone consumer project against the published jar.
# Run from the repo root: sh tools/consumer_check.sh
set -e
cd "$(dirname "$0")/.."
sbt -batch publishLocal
cd tools/consumer
sbt -batch run | tee /tmp/graft_consumer.log
grep -q CONSUMER_OK /tmp/graft_consumer.log && echo "consumer check: OK"

#!/bin/bash
# Serialized TPU job runner: the axon-tunneled compile service wedges when
# two processes compile concurrently, so all ad-hoc TPU jobs must go through
# this flock. Usage: tools/tpu_run.sh <logfile> <python-script> [args...]
set -u
LOG="$1"; shift
exec flock /tmp/tpu.lock env PYTHONPATH=/root/repo:/root/.axon_site python -u "$@" > "$LOG" 2>&1

#!/usr/bin/env bash
# Multi-host evaluation launcher (reference tools/dist_test.sh role).
# Run the same command on every pod host; JAX discovers the topology and
# `--launcher jax` initializes jax.distributed so tools/test.py shards
# the dataset per process and all-gathers detections (multi_host_test).
#
#   ./tools/dist_test.sh <config> <checkpoint> [extra args...]

CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --launcher jax "$@"

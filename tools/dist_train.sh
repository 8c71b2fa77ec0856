#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh role).
# On TPU pods, run this same command on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all`); JAX discovers the pod
# topology from the TPU runtime and `--launcher jax` initializes
# jax.distributed before the train loop (SPMD over all chips).
#
#   ./tools/dist_train.sh <config> [extra args...]

CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" --launcher jax "$@"

#!/usr/bin/env bash
# Slurm launcher (reference tools/slurm_test.sh role) for TPU-pod
# evaluation: one task per host; the dataset is process-sharded and
# host 0 reports the merged metrics (apis/test.py multi_host_test).
#
#   HOSTS=4 ./tools/slurm_test.sh <partition> <job_name> <config> <checkpoint> [extra args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" ${CONFIG} ${CHECKPOINT} --launcher jax ${PY_ARGS}

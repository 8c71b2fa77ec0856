#!/usr/bin/env bash
# Slurm launcher (reference tools/slurm_train.sh role) for TPU-pod
# training: one task per host; `--launcher jax` lets jax.distributed
# derive the process set from the Slurm environment
# (SLURM_PROCID/SLURM_NTASKS — jax's cluster auto-detection).
#
#   GPUS_PER_NODE is meaningless on TPU pods; HOSTS tasks are spawned,
#   one per TPU VM worker.
#
#   HOSTS=4 ./tools/slurm_train.sh <partition> <job_name> <config> <work_dir> [extra args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
    python -u "$(dirname "$0")/train.py" ${CONFIG} --work-dir=${WORK_DIR} --launcher jax ${PY_ARGS}

#!/usr/bin/env bash
# Launch the aligner service across a TPU pod slice.
#
# Replaces the reference's docker-compose (Zookeeper + Kafka + MariaDB +
# node containers): one worker process per host, all joining the same JAX
# mesh; the dispatcher runs on host 0.  Work intake and the results store
# ride a shared ALIGNER_DB (any network filesystem or a host-0 export);
# device-side merging uses ICI collectives, not the queue.
#
# Usage:
#   deploy/launch_pod.sh <num_hosts> <this_host_index> <coordinator_ip>
set -euo pipefail

NUM_HOSTS="${1:?num_hosts}"
HOST_INDEX="${2:?host_index}"
COORDINATOR="${3:?coordinator_ip}"

export ALIGNER_NUM_PROCESSES="$NUM_HOSTS"
export ALIGNER_PROCESS_ID="$HOST_INDEX"
export ALIGNER_COORDINATOR="${COORDINATOR}:8476"
export ALIGNER_DB="${ALIGNER_DB:-/srv/aligner/aligner.db}"
export ALIGNER_LOG="${ALIGNER_LOG:-info}"

if [ "$HOST_INDEX" = "0" ]; then
  python -m aligner_tpu.service.dispatcher --host 0.0.0.0 --port 3030 &
fi

exec python -m aligner_tpu.service.worker --name "node-host${HOST_INDEX}"

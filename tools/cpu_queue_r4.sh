#!/bin/bash
# SUPERSEDED by tools/cpu_queue_r4b.sh (denser densify cadence so the
# config-2 mechanism run clears 150k alive). This stub exists so a stale
# launcher cannot clobber the revision's artifacts with the known-short
# schedule.
echo "cpu_queue_r4.sh is superseded — run tools/cpu_queue_r4b.sh" >&2
exit 1

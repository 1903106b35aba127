#!/bin/bash
# Run a python script on the TPU (axon). Keeps /root/.axon_site on PYTHONPATH
# (its sitecustomize registers the axon PJRT backend) and retries briefly in
# case the previous process's TPU claim hasn't released yet. Output streams
# (python -u + tee) so long drives show progress instead of buffering to exit.
export PYTHONPATH="/root/repo:${PYTHONPATH}"
tmp=$(mktemp)
trap 'rm -f "$tmp"' EXIT
for i in $(seq 1 6); do
  python -u "$@" 2>&1 | tee "$tmp"
  code=${PIPESTATUS[0]}
  if [ $code -ne 0 ] && grep -q "Unable to initialize backend 'axon'" "$tmp"; then
    sleep 10; continue
  fi
  exit $code
done
exit 1

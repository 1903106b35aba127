#!/bin/bash
# Run a python script on the TPU (axon). Keeps /root/.axon_site on PYTHONPATH
# (its sitecustomize registers the axon PJRT backend) and retries briefly in
# case the previous process's TPU claim hasn't released yet.
export PYTHONPATH="/root/repo:${PYTHONPATH}"
for i in $(seq 1 6); do
  out=$(python "$@" 2>&1)
  code=$?
  if [ $code -ne 0 ] && echo "$out" | grep -q "Unable to initialize backend 'axon'"; then
    sleep 10; continue
  fi
  echo "$out"; exit $code
done
echo "$out"; exit 1

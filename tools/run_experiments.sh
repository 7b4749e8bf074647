#!/usr/bin/env bash
# Sequential device-experiment queue: each non-comment line of $1 is a full
# shell command (typically an env-prefixed `python bench.py ...`); results
# append to $2.
set -u
LIST=$1
OUT=$2
while IFS= read -r cmd; do
  [ -z "$cmd" ] && continue
  case "$cmd" in \#*) continue ;; esac
  echo "=== $cmd ($(date +%H:%M:%S))" >> "$OUT"
  eval "$cmd" >> "$OUT" 2>&1
done < "$LIST"
echo "=== queue done ($(date +%H:%M:%S))" >> "$OUT"

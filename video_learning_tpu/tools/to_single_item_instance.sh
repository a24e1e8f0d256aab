#!/usr/bin/env bash
# Deduplicate a `path label…` list file down to one line per item
# (counterpart of the reference's tools/to_single_item_instance.sh awk
# one-liner). Usage: to_single_item_instance.sh in.txt > out.txt
awk '!seen[$1]++' "$1"

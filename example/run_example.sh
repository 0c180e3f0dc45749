#!/usr/bin/env bash
# Extract and execute every ```bash block of the usage markdown — the
# same doc-testing harness as the reference's example/run_example.sh, so
# the walkthrough can never rot silently.
set -e
script_dir=$(dirname "$0")
cd "${script_dir}/.."

MARKDOWN_FILE="${1:-example/QUILT_usage.md}"
tmp=$(mktemp)
awk '/^```bash$/{inblock=1; next} /^```$/{inblock=0} inblock' \
    "${MARKDOWN_FILE}" > "${tmp}"
bash -e "${tmp}"
rm -f "${tmp}"

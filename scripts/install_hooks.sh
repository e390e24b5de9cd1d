#!/usr/bin/env bash
# Install the committed git hooks into .git/hooks (hooks aren't tracked by
# git itself, so each fresh clone/session runs this once).
set -euo pipefail
cd "$(dirname "$0")/.."
install -m 0755 scripts/hooks/pre-commit .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"

#!/bin/sh
# Install the repo's git hooks (VERDICT r11 #4: tools/preship.py existed
# but was opt-in — a src/main commit could still be created without the
# gate). Run once per clone:
#
#   sh tools/install-hooks.sh
#
# The pre-commit hook runs the pre-ship gate whenever staged changes touch
# src/main or src/test. Bypass for genuinely ungateable commits (docs,
# artifacts) happens automatically (the gate exits 0 with nothing to
# gate); bypass for emergencies is git's own `--no-verify`, which leaves
# an explicit trace in the committer's hands rather than a silent default.
set -e
REPO_ROOT=$(git rev-parse --show-toplevel)
HOOK="$REPO_ROOT/.git/hooks/pre-commit"
cat > "$HOOK" <<'EOF'
#!/bin/sh
# Auto-installed by tools/install-hooks.sh — the pre-ship gate.
# A commit touching src/ must not ship unexecuted declared-query changes.
if git diff --cached --name-only | grep -q '^src/'; then
    echo "[pre-commit] src/ staged - running the pre-ship gate" >&2
    # the gate diffs HEAD..working-tree (staged+unstaged): strictly more
    # conservative than staged-only, and what preship.py documents
    python3 "$(git rev-parse --show-toplevel)/tools/preship.py" --skip-tests
else
    echo "[pre-commit] no src/ changes staged - gate skipped" >&2
fi
EOF
chmod +x "$HOOK"
echo "[install-hooks] pre-commit gate installed at $HOOK"

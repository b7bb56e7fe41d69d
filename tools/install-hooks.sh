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
# A commit touching src/ or tools/*.scala must not ship unexecuted (or
# non-compiling) changes. --skip-tests here skips only the FULL
# touched-spec closure: preship still compiles the whole tree (test
# sources + changed tools) and still RUNS any spec that is the sole
# coverage of a changed main file or was itself changed — the r13 RED
# suite shipped through the old unconditional skip, never again.
if git diff --cached --name-only | grep -Eq '^src/|^tools/.*\.scala$'; then
    echo "[pre-commit] gated sources staged - running the pre-ship gate" >&2
    # the gate diffs HEAD..working-tree (staged+unstaged): strictly more
    # conservative than staged-only, and what preship.py documents
    python3 "$(git rev-parse --show-toplevel)/tools/preship.py" --skip-tests
else
    echo "[pre-commit] no gated sources staged - gate skipped" >&2
fi
EOF
chmod +x "$HOOK"
echo "[install-hooks] pre-commit gate installed at $HOOK"

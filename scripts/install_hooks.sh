#!/bin/sh
# Install the import-smoke pre-commit gate (see precommit_gate.sh).
cd "$(git rev-parse --show-toplevel)"
cat > .git/hooks/pre-commit <<'HOOK'
#!/bin/sh
exec sh "$(git rev-parse --show-toplevel)/scripts/precommit_gate.sh"
HOOK
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"

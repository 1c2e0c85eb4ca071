"""Plan inspection: machine-checkable assertions about physical plans
(pushdown, pruning, broadcast, shuffle counts, codegen)."""

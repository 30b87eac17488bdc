"""Dev tools (correctness checker, plan audit, benchmarks); package
init so tests can import shared helpers (e.g. the global-window
detector in audit_plans)."""

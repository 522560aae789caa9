"""Test-only stand-in for the `batchgenerators` package (not installed in this
image) providing exactly the functions the reference code under test imports.
Faithful reimplementations of the public batchgenerators semantics — used so
/root/reference modules can be imported for golden-parity tests."""

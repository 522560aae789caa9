"""Test-only skimage stub: satisfies the reference preprocessing module's
import chain. resize itself must never be called in the parity tests (they
run export at the no-resampling shape); it raises if reached."""

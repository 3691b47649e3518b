"""Reusable column-expression builders (JVM-side, codegen-friendly)."""

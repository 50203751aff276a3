"""Python-`re` → Java-regex dialect translation (SURVEY.md §2.8 F1 note).

The reference's schemas carry Python-flavored patterns compiled with
``re.IGNORECASE | re.DOTALL`` (extraction/form_filler.py:69-77). Spark's
``regexp_extract`` uses java.util.regex, which has no flags argument, so we
compile the flags *into* the pattern and fix the few dialect divergences that
appear in schema-style patterns. Translation happens once at plan-build time
in Python -- never per row.
"""

from __future__ import annotations

import re


def py_regex_to_java(pattern: str, ignorecase: bool = True, dotall: bool = True) -> str:
    """Translate a Python regex string to a Java-compatible one.

    Handles the constructs that occur in field-extraction patterns:
    - inline flag injection for IGNORECASE/DOTALL (``(?i)(?s)`` prefix)
    - Python named groups ``(?P<name>...)`` → Java ``(?<name>...)``
    - named backrefs ``(?P=name)`` → ``\\k<name>``
    Everything else in the common subset (classes, quantifiers, anchors,
    lookarounds) is identical between the dialects.
    """
    out = pattern
    out = re.sub(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>", r"(?<\1>", out)
    out = re.sub(r"\(\?P=([A-Za-z_][A-Za-z0-9_]*)\)", r"\\k<\1>", out)
    flags = ""
    if ignorecase and "(?i" not in out:
        flags += "i"
    if dotall and "(?s" not in out:
        flags += "s"
    return f"(?{flags}){out}" if flags else out

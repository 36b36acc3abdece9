"""Deterministic YAML rendering for the FederatedCode export layout.

Matches the style the reference's exporter produces via saneyaml
(pipes/export.py write_file + the expected files under
tests/test_data/exporters/federate_vulnerabilities): two-space indent,
block lists indented under their key with ``- `` items, empty
collections inline as ``[]``/``{}``, ``None`` and empty strings rendered
as a bare ``key:``, and number-looking or YAML-keyword strings
single-quoted so they round-trip as strings. Independent minimal
implementation — this engine ships no YAML dependency.
"""

from __future__ import annotations

_YAML_KEYWORDS = {"true", "false", "yes", "no", "on", "off", "null", "none",
                  "~", ""}

# Characters that act as YAML indicators at the START of a plain scalar
# regardless of what follows (alias/anchor/tag/directive/reserved/flow):
# ``*foo`` is an alias, ``&foo`` an anchor, ``!foo`` a tag, ``%`` a
# directive, ``@``/`````` reserved, quotes/flow/comment chars ambiguous.
# ``-``/``?``/``:`` are only indicators when followed by space (or alone),
# handled separately below so plain ``-rc1`` / ``?x`` stay unquoted.
_LEAD_INDICATORS = tuple("!&*%@`\"'[]{}#|>,")


def _is_number_like(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _needs_quote(s: str) -> bool:
    return (s.lower() in _YAML_KEYWORDS or _is_number_like(s)
            or s != s.strip()
            or s.startswith(_LEAD_INDICATORS)
            or s.startswith(("- ", "? ", ": "))
            or s in ("-", "?", ":")
            or ": " in s or s.endswith(":") or " #" in s)


def _scalar(value) -> str:
    """Render a SINGLE-LINE scalar; multi-line strings are handled by
    the block emitters in ``_dump`` (never routed here)."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    s = str(value)
    if s == "":
        return ""
    if "\n" in s or "\t" in s:  # escape so newlines/tabs survive parsing
        return _double_quoted(s)
    if _needs_quote(s):
        return "'" + s.replace("'", "''") + "'"
    return s


def _double_quoted(s: str) -> str:
    """YAML double-quoted scalar with escaped newlines — preserves line
    breaks exactly (single-quoted raw newlines would FOLD into spaces)."""
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    out = out.replace("\r", "\\r").replace("\n", "\\n").replace("\t", "\\t")
    return '"' + out + '"'


def _block_literal_lines(s: str, indent: int):
    """Return the ``|``-style block lines for a multi-line string, or
    ``None`` when block style can't represent it faithfully (trailing
    whitespace on a line, a first line starting with a space, control
    chars) — callers then fall back to a double-quoted scalar.

    Matches the reference's saneyaml, which emits multi-line strings in
    literal block style so embedded newlines round-trip verbatim
    (single-quoting the raw text would fold them into spaces on parse).
    """
    if s.endswith("\n") and not s.endswith("\n\n"):
        header, body = "|", s[:-1]
    elif not s.endswith("\n"):
        header, body = "|-", s
    else:  # multiple trailing newlines need keep-chomping edge cases
        return None
    lines = body.split("\n")
    pad = "  " * indent
    for ln in lines:
        if ln != ln.rstrip() or any(ord(c) < 32 and c != "\t" for c in ln):
            return None
    first_nonempty = next((ln for ln in lines if ln), None)
    if first_nonempty is None:
        return None  # all-empty body (e.g. "\n") parses as "" — escape it
    if first_nonempty.startswith((" ", "\t")):
        return None  # would need an explicit indentation indicator
    return [header] + [f"{pad}{ln}" if ln else "" for ln in lines]


def _emit_scalar(lines: list, prefix: str, v, child_indent: int) -> None:
    """Append ``prefix`` + scalar, using a block literal (or escaped
    double-quoted fallback) when the string holds real newlines."""
    if isinstance(v, str) and "\n" in v:
        block = _block_literal_lines(v, child_indent)
        if block is not None:
            lines.append(f"{prefix} {block[0]}")
            lines.extend(block[1:])
        else:
            lines.append(f"{prefix} {_double_quoted(v)}")
        return
    s = _scalar(v)
    lines.append(f"{prefix} {s}" if s else prefix)


def _dump(value, indent: int, lines: list) -> None:
    pad = "  " * indent
    if isinstance(value, dict):
        for k, v in value.items():
            if isinstance(v, dict):
                if not v:
                    lines.append(f"{pad}{k}: {{}}")
                else:
                    lines.append(f"{pad}{k}:")
                    _dump(v, indent + 1, lines)
            elif isinstance(v, (list, tuple)):
                if not v:
                    lines.append(f"{pad}{k}: []")
                else:
                    lines.append(f"{pad}{k}:")
                    _dump(list(v), indent + 1, lines)
            else:
                _emit_scalar(lines, f"{pad}{k}:", v, indent + 1)
    elif isinstance(value, list):
        for item in value:
            if isinstance(item, dict) and item:
                first = True
                for k, v in item.items():
                    head = f"{pad}- " if first else f"{pad}  "
                    first = False
                    if isinstance(v, dict):
                        if not v:
                            lines.append(f"{head}{k}: {{}}")
                        else:
                            lines.append(f"{head}{k}:")
                            _dump(v, indent + 2, lines)
                    elif isinstance(v, (list, tuple)):
                        if not v:
                            lines.append(f"{head}{k}: []")
                        else:
                            lines.append(f"{head}{k}:")
                            _dump(list(v), indent + 2, lines)
                    else:
                        _emit_scalar(lines, f"{head}{k}:", v, indent + 2)
            else:
                _emit_scalar(lines, f"{pad}-", item, indent + 1)
    else:
        if isinstance(value, str) and "\n" in value:
            _emit_scalar(lines, pad.rstrip() if pad else "", value, indent)
        else:
            lines.append(f"{pad}{_scalar(value)}")


def dump_yaml(data) -> str:
    """Render ``data`` (dicts/lists/scalars) as saneyaml-style YAML with
    a trailing newline."""
    lines: list = []
    _dump(data, 0, lines)
    return "\n".join(lines) + "\n"

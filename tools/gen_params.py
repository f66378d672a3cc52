"""Generate the v1.5 parameter universe as Python data tables.

Reads the reference's Rust parameter constants
(``/root/reference/tfhe/src/shortint/parameters/``) — 57.7k LoC of struct
literals — and emits ``tfhe_tpu/utils/params_universe.py``: one dict entry
per named set, covering every constant reachable from the ``current_params``
(v1_5) tree plus the public alias list (``aliases.rs``).

Parameter values are cryptographic constants that MUST match the reference
bit-for-bit; this generator exists so they are data, not hand-typed code.

Usage: python tools/gen_params.py [reference_root] [out.py]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(
    sys.argv[2] if len(sys.argv) > 2 else "tfhe_tpu/utils/params_universe.py"
)
PARAM_DIR = REF / "tfhe/src/shortint/parameters"

CONST_RE = re.compile(
    r"pub const ([A-Z0-9_]+)\s*:\s*\n?\s*([A-Za-z0-9_:<>]+)\s*=\s*", re.M
)


def read_all_sources() -> str:
    chunks = []
    for f in sorted(PARAM_DIR.rglob("*.rs")):
        chunks.append(f.read_text())
    return "\n".join(chunks)


def split_consts(src: str):
    """Yield (name, rust_type, body) for each `pub const NAME: T = BODY;`."""
    for m in CONST_RE.finditer(src):
        name, rtype = m.group(1), m.group(2)
        i = m.end()
        depth = 0
        j = i
        while j < len(src):
            c = src[j]
            if c in "({[":
                depth += 1
            elif c in ")}]":
                depth -= 1
            elif c == ";" and depth == 0:
                break
            j += 1
        yield name, rtype.split("::")[-1], src[i:j].strip()


NEWTYPE_RE = re.compile(
    r"^(?:LweDimension|GlweDimension|PolynomialSize|DecompositionBaseLog|"
    r"DecompositionLevelCount|MessageModulus|CarryModulus|LweCiphertextCount|"
    r"CiphertextModulusLog|LweBskGroupingFactor|NoiseEstimationMeasureBound|"
    r"RSigmaFactor|Variance|StandardDev)\(\s*([-0-9.ef_]+)\s*\)$"
)


def _num(s: str):
    s = re.sub(r"(f64|f32)$", "", s).replace("_", "")
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    return float(s)


def parse_value(expr: str):
    expr = expr.strip().rstrip(",")
    m = NEWTYPE_RE.match(expr)
    if m:
        return _num(m.group(1))
    if expr == "MaxNoiseLevel::UNKNOWN":
        return ("max_noise_unknown",)
    mm = re.match(r"^MaxNoiseLevel::new\(\s*([0-9_]+)\s*\)$", expr)
    if mm:
        return _num(mm.group(1))
    if re.fullmatch(r"-?[0-9._]+(?:f64)?(?:e-?\d+)?", expr) or re.fullmatch(
        r"-?[0-9._]+e-?[0-9]+(?:f64)?", expr
    ):
        return _num(expr)
    if expr in ("true", "false"):
        return expr == "true"
    m = re.match(
        r"^DynamicDistribution::new_gaussian_from_std_dev\(\s*StandardDev\(\s*"
        r"([-0-9.ef_]+)\s*,?\s*\)\s*,?\s*\)$",
        expr,
        re.S,
    )
    if m:
        return ("gaussian", _num(m.group(1)))
    m = re.match(r"^DynamicDistribution::new_t_uniform\(\s*([0-9_]+)\s*\)$", expr)
    if m:
        return ("t_uniform", _num(m.group(1)))
    m = re.match(r"^(?:Core)?CiphertextModulus(?:32)?::(?:<u(\d+)>::)?new_native\(\)$", expr)
    if m:
        return ("native", int(m.group(1)) if m.group(1) else None)
    m = re.match(r"^(?:Core)?CiphertextModulus(?:32)?::(?:<u(\d+)>::)?new\(\s*(?:1\s*<<\s*(\d+)|([0-9_]+))\s*\)$", expr)
    if m:
        bits = int(m.group(1)) if m.group(1) else None
        val = (1 << int(m.group(2))) if m.group(2) else _num(m.group(3))
        return ("modulus", val, bits)
    m = re.match(r"^EncryptionKeyChoice::(\w+)$", expr)
    if m:
        return ("key_choice", m.group(1).lower())
    if expr == "ModulusSwitchType::Standard":
        return ("ms", "standard")
    if expr == "ModulusSwitchType::CenteredMeanNoiseReduction":
        return ("ms", "centered_mean")
    m = re.match(
        r"^ModulusSwitchType::DriftTechniqueNoiseReduction\(\s*"
        r"ModulusSwitchNoiseReductionParams\s*\{(.*)\}\s*,?\s*\)$",
        expr,
        re.S,
    )
    if m:
        inner = parse_struct_fields(m.group(1))
        return ("ms_drift", inner)
    m = re.match(r"^CompactCiphertextListExpansionKind::(\w+)$", expr)
    if m:
        return ("expansion", m.group(1))
    m = re.match(
        r"^CompactCiphertextListExpansionKind::NoCasting\(\s*PBSOrder::(\w+)\s*\)$",
        expr,
    )
    if m:
        return ("expansion_nocast", m.group(1))
    m = re.match(r"^SupportedCompactPkeZkScheme::(\w+)$", expr)
    if m:
        return ("zk_scheme", m.group(1))
    m = re.match(r"^PBSOrder::(\w+)$", expr)
    if m:
        return ("pbs_order", m.group(1))
    if expr == "None":
        return ("none",)
    m = re.match(r"^Some\((.*)\)$", expr, re.S)
    if m:
        return parse_value(m.group(1))
    m = re.match(r"^Backend::(\w+)$", expr)
    if m:
        return ("backend", m.group(1).lower())
    # bare const reference (possibly a full crate path)
    m = re.fullmatch(r"(?:[A-Za-z0-9_]+::)*([A-Z][A-Z0-9_]{2,})", expr)
    if m:
        return ("const_ref", m.group(1))
    # nested struct literal
    m = re.match(r"^([A-Za-z0-9_]+)\s*\{(.*)\}\s*$", expr, re.S)
    if m:
        return ("nested", m.group(1), parse_struct_fields(m.group(2)))
    # generic enum wrapper(s) around another value, e.g.
    # AtomicPatternParameters::Standard(PBSParameters::PBS(NAME))
    m = re.match(r"^[A-Za-z0-9_]+::([A-Za-z0-9_]+)\((.*)\)$", expr, re.S)
    if m:
        inner = parse_value(m.group(2).strip().rstrip(","))
        if isinstance(inner, tuple) and inner[0] == "raw":
            return ("raw", expr)
        return ("wrapped", m.group(1), inner)
    return ("raw", expr)


def parse_struct_fields(body: str) -> dict:
    """Parse `field: value, ...` with balanced nesting."""
    out = {}
    i = 0
    n = len(body)
    while i < n:
        m = re.compile(r"\s*([a-z_0-9]+)\s*:\s*").match(body, i)
        if not m:
            break
        field = m.group(1)
        j = m.end()
        depth = 0
        k = j
        while k < n:
            c = body[k]
            if c in "({[":
                depth += 1
            elif c in ")}]":
                depth -= 1
            elif c == "," and depth == 0:
                break
            k += 1
        out[field] = parse_value(body[j:k])
        i = k + 1
    return out


def parse_const_body(body: str):
    """Returns ('alias', target) | ('struct', kind, fields)."""
    body = body.strip()
    if body.endswith(".validate()"):
        body = body[: -len(".validate()")].strip()
    # plain alias (possibly a full path)
    m = re.fullmatch(r"[A-Za-z0-9_:<>]*?([A-Z][A-Z0-9_]*)", body)
    if m and "{" not in body:
        return ("alias", m.group(1))
    # enum-wrapped struct: NoiseSquashingParameters::Classic(Inner { .. })
    m = re.match(
        r"^([A-Za-z0-9_]+)::([A-Za-z0-9_]+)\(\s*([A-Za-z0-9_]+)\s*\{(.*)\}\s*,?\s*\)$",
        body,
        re.S,
    )
    if m:
        return (
            "struct",
            f"{m.group(1)}::{m.group(2)}",
            parse_struct_fields(m.group(4)),
        )
    m = re.match(r"^([A-Za-z0-9_]+)\s*\{(.*)\}$", body, re.S)
    if m:
        return ("struct", m.group(1), parse_struct_fields(m.group(2)))
    return ("raw", body)


def main():
    src = read_all_sources()
    consts = {}
    for name, rtype, body in split_consts(src):
        consts[name] = (rtype, parse_const_body(body))

    # resolve aliases to concrete structs
    def resolve(name, seen=()):
        if name not in consts or name in seen:
            return None
        rtype, parsed = consts[name]
        if parsed[0] == "alias":
            return resolve(parsed[1], seen + (name,))
        if parsed[0] == "struct":
            return (rtype, parsed[1], parsed[2])
        return None

    # emit: every V1_5_* const + every alias exported by aliases.rs
    alias_src = (PARAM_DIR / "aliases.rs").read_text()
    alias_names = []
    for m in CONST_RE.finditer(alias_src):
        alias_names.append(m.group(1))

    emitted = {}
    skipped = []
    for name in sorted(consts):
        if not (name.startswith("V1_5_") or name in alias_names):
            continue
        r = resolve(name)
        if r is None:
            skipped.append(name)
            continue
        rtype, kind, fields = r
        bad = [
            f for f, v in fields.items()
            if isinstance(v, tuple) and v[0] == "raw"
        ]
        if bad:
            skipped.append(f"{name} (unparsed fields: {bad})")
            continue
        emitted[name] = (rtype, kind, fields)

    with OUT.open("w") as f:
        f.write(
            '"""GENERATED by tools/gen_params.py — DO NOT EDIT BY HAND.\n\n'
            "The reference's v1.5 parameter universe (every constant reachable\n"
            "from tfhe/src/shortint/parameters current_params plus the public\n"
            "aliases.rs names) as plain data. Values are cryptographic\n"
            "constants copied verbatim from the reference (they MUST match).\n"
            '"""\n\n'
            "# fmt: off\n"
            "RAW_PARAMS = {\n"
        )
        for name, (rtype, kind, fields) in sorted(emitted.items()):
            f.write(f"  {name!r}: ({kind!r}, {fields!r}),\n")
        f.write("}\n# fmt: on\n")
    print(f"emitted {len(emitted)} parameter sets to {OUT}")
    if skipped:
        print(f"skipped {len(skipped)}:")
        for s in skipped[:40]:
            print("  ", s)


if __name__ == "__main__":
    main()

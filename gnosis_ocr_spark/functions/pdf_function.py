"""PDF function objects (ISO 32000-1 §7.10): Type 0 sampled, Type 2
exponential interpolation, Type 3 stitching, and Type 4 PostScript
calculator functions, plus the evaluator the image-colorspace path uses
for /Separation and single-colorant /DeviceN tint transforms
(``codec_pdf._resolve_colorspace``). Reference behavior to match:
poppler evaluates the tint transform into the alternate space when it
rasterizes such images (/root/reference/app/jobs.py:386-390 renders
scanned pages through poppler transparently).

Honest scope: one-input functions only — a /Separation tint transform is
1-in by definition, and single-colorant /DeviceN is the only DeviceN
shape the gray-LUT reduction can represent; multi-colorant DeviceN
parses to None upstream and the image degrades to the opaque carry
exactly as before. Outputs: any component count. Type 0 supports
BitsPerSample 1/2/4/8/12/16/24/32 with linear interpolation (a /Order 3
declaration is evaluated linearly — the common un-color-managed reader
fallback). Type 4 implements the full §7.10.5.2 operator set with the
spec's 100-entry operand-stack limit and a deterministic execution-step
cap (the language has no loops, so the cap is a hostile-input bound, not
a semantic limit).

Everything here is hostile-input bounded: sample tables cap at 64 Ki
values, stitching nests at most 8 deep, and every parse/eval error
surfaces as ``None``/``ValueError`` so the caller degrades instead of
crashing an executor.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

_NUM_ARR_RE_CACHE: dict[bytes, re.Pattern] = {}
_MAX_SAMPLES = 65536
_MAX_DEPTH = 8
_STACK_LIMIT = 100
_STEP_LIMIT = 100_000


def _num_array(body: bytes, key: bytes) -> list[float] | None:
    """``/Key [ n n ... ]`` → floats; None when the key is absent."""
    pat = _NUM_ARR_RE_CACHE.get(key)
    if pat is None:
        pat = re.compile(
            re.escape(key) + rb"\s*\[([-+0-9.eE\s]*)\]"
        )
        _NUM_ARR_RE_CACHE[key] = pat
    m = pat.search(body)
    if not m:
        return None
    try:
        return [float(t) for t in m.group(1).split()]
    except ValueError:
        return None


def _num_value(body: bytes, key: bytes) -> float | None:
    m = re.search(re.escape(key) + rb"\s+([-+]?[0-9.]+)", body)
    if not m:
        return None
    try:
        return float(m.group(1))
    except ValueError:
        return None


@dataclass(frozen=True)
class PdfFunction:
    """One parsed function: ``payload`` is type-specific (see parse)."""

    ftype: int
    domain: tuple[float, float]
    rng: tuple[float, ...] | None  # flat [min0 max0 min1 max1 ...]
    payload: tuple


# ---------------------------------------------------------------------------
# Type 4 — PostScript calculator (§7.10.5)
# ---------------------------------------------------------------------------

_T4_TOKEN_RE = re.compile(
    rb"\{|\}|[-+]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?|[a-z]+"
)


def _t4_parse(data: bytes):
    """Calculator program text → nested token list (the outer procedure).
    Numbers become int/float, operators stay str, braces nest."""
    toks = _T4_TOKEN_RE.findall(data)
    pos = 0

    def proc():
        nonlocal pos
        out: list = []
        while pos < len(toks):
            t = toks[pos]
            pos += 1
            if t == b"{":
                out.append(proc())
            elif t == b"}":
                return out
            else:
                s = t.decode("ascii")
                if s[0].isdigit() or s[0] in "+-.":
                    out.append(float(s) if ("." in s or "e" in s or "E" in s)
                               else int(s))
                else:
                    out.append(s)
        raise ValueError("type4: unbalanced braces")

    # skip to the outer '{'
    while pos < len(toks) and toks[pos] != b"{":
        pos += 1
    if pos >= len(toks):
        raise ValueError("type4: no procedure")
    pos += 1
    prog = proc()
    return prog


def _t4_num(v):
    if isinstance(v, bool) or isinstance(v, list):
        raise ValueError("type4: number expected")
    return v


def _t4_int(v):
    v = _t4_num(v)
    if isinstance(v, float):
        if v != int(v):
            raise ValueError("type4: integer expected")
        v = int(v)
    return v


def _t4_exec(proc: list, stack: list, budget: list) -> None:
    for tok in proc:
        budget[0] -= 1
        if budget[0] <= 0:
            raise ValueError("type4: step budget exhausted")
        if isinstance(tok, (int, float)) or isinstance(tok, list):
            stack.append(tok)
            if len(stack) > _STACK_LIMIT:
                raise ValueError("type4: stack overflow")
            continue
        op = tok
        s = stack
        try:
            if op == "if":
                p = s.pop()
                b = s.pop()
                if not isinstance(p, list) or not isinstance(b, bool):
                    raise ValueError("type4: if wants bool proc")
                if b:
                    _t4_exec(p, s, budget)
            elif op == "ifelse":
                p2 = s.pop()
                p1 = s.pop()
                b = s.pop()
                if (not isinstance(p1, list) or not isinstance(p2, list)
                        or not isinstance(b, bool)):
                    raise ValueError("type4: ifelse wants bool proc proc")
                _t4_exec(p1 if b else p2, s, budget)
            elif op == "add":
                b, a = _t4_num(s.pop()), _t4_num(s.pop())
                s.append(a + b)
            elif op == "sub":
                b, a = _t4_num(s.pop()), _t4_num(s.pop())
                s.append(a - b)
            elif op == "mul":
                b, a = _t4_num(s.pop()), _t4_num(s.pop())
                s.append(a * b)
            elif op == "div":
                b, a = _t4_num(s.pop()), _t4_num(s.pop())
                s.append(a / b)
            elif op == "idiv":
                b, a = _t4_int(s.pop()), _t4_int(s.pop())
                s.append(int(a / b) if b else 1 // 0)
            elif op == "mod":
                b, a = _t4_int(s.pop()), _t4_int(s.pop())
                s.append(int(math.fmod(a, b)) if b else 1 // 0)
            elif op == "neg":
                s.append(-_t4_num(s.pop()))
            elif op == "abs":
                s.append(abs(_t4_num(s.pop())))
            elif op == "ceiling":
                s.append(float(math.ceil(_t4_num(s.pop()))))
            elif op == "floor":
                s.append(float(math.floor(_t4_num(s.pop()))))
            elif op == "round":
                v = _t4_num(s.pop())
                # PostScript round: nearest, ties toward +infinity
                s.append(float(math.floor(v + 0.5)))
            elif op == "truncate":
                s.append(float(math.trunc(_t4_num(s.pop()))))
            elif op == "sqrt":
                s.append(math.sqrt(_t4_num(s.pop())))
            elif op == "sin":
                s.append(math.sin(math.radians(_t4_num(s.pop()))))
            elif op == "cos":
                s.append(math.cos(math.radians(_t4_num(s.pop()))))
            elif op == "atan":
                den, num = _t4_num(s.pop()), _t4_num(s.pop())
                ang = math.degrees(math.atan2(num, den))
                s.append(ang + 360.0 if ang < 0 else ang)
            elif op == "exp":
                e, b = _t4_num(s.pop()), _t4_num(s.pop())
                if b < 0 and float(e) != int(e):
                    # Python would return a COMPLEX here; PostScript errors
                    raise ValueError("type4: negative base, fractional exp")
                s.append(float(b ** e))
            elif op == "ln":
                s.append(math.log(_t4_num(s.pop())))
            elif op == "log":
                s.append(math.log10(_t4_num(s.pop())))
            elif op == "cvi":
                s.append(int(math.trunc(_t4_num(s.pop()))))
            elif op == "cvr":
                s.append(float(_t4_num(s.pop())))
            elif op in ("and", "or", "xor"):
                b, a = s.pop(), s.pop()
                if isinstance(a, bool) and isinstance(b, bool):
                    s.append({"and": a and b, "or": a or b,
                              "xor": a != b}[op])
                else:
                    a, b = _t4_int(a), _t4_int(b)
                    s.append({"and": a & b, "or": a | b,
                              "xor": a ^ b}[op])
            elif op == "not":
                a = s.pop()
                s.append((not a) if isinstance(a, bool) else ~_t4_int(a))
            elif op == "bitshift":
                sh, a = _t4_int(s.pop()), _t4_int(s.pop())
                if abs(sh) > 64:
                    raise ValueError("type4: bitshift out of range")
                s.append(a << sh if sh >= 0 else a >> -sh)
            elif op in ("eq", "ne", "gt", "ge", "lt", "le"):
                b, a = s.pop(), s.pop()
                if isinstance(a, list) or isinstance(b, list):
                    raise ValueError("type4: comparison of procedures")
                if op in ("eq", "ne"):
                    r = (a == b) if op == "eq" else (a != b)
                else:
                    a, b = _t4_num(a), _t4_num(b)
                    r = {"gt": a > b, "ge": a >= b,
                         "lt": a < b, "le": a <= b}[op]
                s.append(r)
            elif op == "true":
                s.append(True)
            elif op == "false":
                s.append(False)
            elif op == "pop":
                s.pop()
            elif op == "exch":
                b, a = s.pop(), s.pop()
                s.append(b)
                s.append(a)
            elif op == "dup":
                s.append(s[-1])
            elif op == "copy":
                n = _t4_int(s.pop())
                if n < 0 or n > len(s) or len(s) + n > _STACK_LIMIT:
                    raise ValueError("type4: bad copy count")
                if n:
                    s.extend(s[-n:])
            elif op == "index":
                n = _t4_int(s.pop())
                if n < 0 or n >= len(s):
                    raise ValueError("type4: bad index")
                s.append(s[-1 - n])
            elif op == "roll":
                j = _t4_int(s.pop())
                n = _t4_int(s.pop())
                if n < 0 or n > len(s):
                    raise ValueError("type4: bad roll count")
                if n:
                    j %= n
                    if j:
                        seg = s[-n:]
                        del s[-n:]
                        s.extend(seg[-j:] + seg[:-j])
            else:
                raise ValueError(f"type4: unknown operator {op!r}")
        except IndexError:
            raise ValueError("type4: stack underflow") from None
        except (ZeroDivisionError, OverflowError) as e:
            raise ValueError(f"type4: {e}") from None
        if len(stack) > _STACK_LIMIT:
            raise ValueError("type4: stack overflow")


# ---------------------------------------------------------------------------
# Type 0 — sampled (§7.10.2), one input dimension
# ---------------------------------------------------------------------------


def _unpack_samples(data: bytes, count: int, bps: int) -> list[int] | None:
    if bps not in (1, 2, 4, 8, 12, 16, 24, 32):
        return None
    if count > _MAX_SAMPLES or count * bps > len(data) * 8:
        return None
    if bps == 8:
        return list(data[:count])
    out: list[int] = []
    acc = 0
    nbits = 0
    i = 0
    for _ in range(count):
        while nbits < bps:
            acc = (acc << 8) | data[i]
            i += 1
            nbits += 8
        nbits -= bps
        out.append((acc >> nbits) & ((1 << bps) - 1))
        acc &= (1 << nbits) - 1
    return out


# ---------------------------------------------------------------------------
# parse + eval
# ---------------------------------------------------------------------------


def _interp(x: float, x0: float, x1: float, y0: float, y1: float) -> float:
    if x1 == x0:
        return y0
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def parse_function(
    spec: bytes, obj_body, resolve, depth: int = 0
) -> PdfFunction | None:
    """A function operand — ``N 0 R`` indirect ref or an inline
    ``<< ... >>`` dict (Types 2/3 only) — parsed to a :class:`PdfFunction`;
    None on anything unsupported (caller degrades)."""
    if depth > _MAX_DEPTH:
        return None
    spec = spec.strip()
    stream_data: bytes | None = None
    m = re.match(rb"(\d+)\s+\d+\s+R", spec)
    if m:
        if obj_body is None:
            return None
        num = int(m.group(1))
        body = obj_body(num)
        if body is None:
            return None
        if b"stream" in body and resolve is not None:
            stream_data = resolve(num)
    elif spec.startswith(b"<<"):
        body = spec
    else:
        return None

    ft = _num_value(body, b"/FunctionType")
    dom = _num_array(body, b"/Domain")
    if ft is None or not dom or len(dom) < 2:
        return None
    ft = int(ft)
    domain = (dom[0], dom[1])
    if len(dom) != 2 and ft != 3:
        return None  # one-input scope (stitching re-checks its own arity)
    rng_l = _num_array(body, b"/Range")
    rng = tuple(rng_l) if rng_l else None

    if ft == 2:
        c0 = _num_array(body, b"/C0") or [0.0]
        c1 = _num_array(body, b"/C1") or [1.0]
        n = _num_value(body, b"/N")
        if n is None or len(c0) != len(c1):
            return None
        return PdfFunction(2, domain, rng, (tuple(c0), tuple(c1), n))

    if ft == 3:
        if len(dom) != 2:
            return None
        fm = re.search(rb"/Functions\s*\[", body)
        if not fm:
            return None
        arr = _balanced(body, fm.end() - 1)
        if arr is None:
            return None
        subs: list[PdfFunction] = []
        for tok in _iter_fn_tokens(arr[1:-1]):
            sub = parse_function(tok, obj_body, resolve, depth + 1)
            if sub is None:
                return None
            subs.append(sub)
        bounds = _num_array(body, b"/Bounds")
        enc = _num_array(body, b"/Encode")
        if bounds is None or enc is None:
            return None
        if len(bounds) != len(subs) - 1 or len(enc) != 2 * len(subs):
            return None
        return PdfFunction(
            3, domain, rng, (tuple(subs), tuple(bounds), tuple(enc))
        )

    if ft == 0:
        if stream_data is None or rng is None:
            return None
        size = _num_array(body, b"/Size")
        bps = _num_value(body, b"/BitsPerSample")
        if not size or len(size) != 1 or bps is None:
            return None
        s0, bps = int(size[0]), int(bps)
        n_out = len(rng) // 2
        if s0 < 1 or n_out < 1:
            return None
        samples = _unpack_samples(stream_data, s0 * n_out, bps)
        if samples is None:
            return None
        enc = _num_array(body, b"/Encode") or [0.0, float(s0 - 1)]
        dec = _num_array(body, b"/Decode") or list(rng)
        if len(enc) < 2 or len(dec) < 2 * n_out:
            return None
        return PdfFunction(
            0, domain, rng,
            (s0, bps, n_out, tuple(samples), (enc[0], enc[1]), tuple(dec)),
        )

    if ft == 4:
        if stream_data is None:
            return None
        try:
            prog = _t4_parse(stream_data)
        except ValueError:
            return None
        if rng is None:
            return None
        return PdfFunction(4, domain, rng, (prog,))

    return None


def _balanced(b: bytes, start: int) -> bytes | None:
    depth = 0
    for j in range(start, len(b)):
        c = b[j : j + 1]
        if c == b"[":
            depth += 1
        elif c == b"]":
            depth -= 1
            if depth == 0:
                return b[start : j + 1]
    return None


def _iter_fn_tokens(arr: bytes):
    """Items of a /Functions array: indirect refs or inline dicts."""
    i = 0
    n = len(arr)
    while i < n:
        ch = arr[i : i + 1]
        if ch.isspace() or ch == b"":
            i += 1
            continue
        m = re.match(rb"\d+\s+\d+\s+R", arr[i:])
        if m:
            yield m.group(0)
            i += m.end()
            continue
        if arr[i : i + 2] == b"<<":
            depth = 0
            j = i
            while j < n - 1:
                if arr[j : j + 2] == b"<<":
                    depth += 1
                    j += 2
                elif arr[j : j + 2] == b">>":
                    depth -= 1
                    j += 2
                    if depth == 0:
                        break
                else:
                    j += 1
            yield arr[i:j]
            i = j
            continue
        return  # unknown item: stop (caller sees a short list and fails)


def eval_function(fn: PdfFunction, x: float) -> tuple[float, ...]:
    """Evaluate a one-input function; Domain-clips the input and
    Range-clips the outputs (§7.10.1). Raises ValueError on execution
    errors (Type 4 hostile programs)."""
    d0, d1 = fn.domain
    x = min(max(x, d0), d1)

    if fn.ftype == 2:
        c0, c1, n = fn.payload
        t = x ** n
        out = tuple(a + t * (b - a) for a, b in zip(c0, c1))

    elif fn.ftype == 3:
        subs, bounds, enc = fn.payload
        k = 0
        while k < len(bounds) and x >= bounds[k]:
            k += 1
        lo = d0 if k == 0 else bounds[k - 1]
        hi = d1 if k == len(bounds) else bounds[k]
        e = _interp(x, lo, hi, enc[2 * k], enc[2 * k + 1])
        return eval_function(subs[k], e)

    elif fn.ftype == 0:
        s0, bps, n_out, samples, (e0, e1), dec = fn.payload
        e = _interp(x, d0, d1, e0, e1)
        e = min(max(e, 0.0), float(s0 - 1))
        k = int(e)
        frac = e - k
        k2 = min(k + 1, s0 - 1)
        maxv = float((1 << bps) - 1)
        out_l = []
        for j in range(n_out):
            v = samples[k * n_out + j] * (1 - frac) + \
                samples[k2 * n_out + j] * frac
            out_l.append(
                _interp(v, 0.0, maxv, dec[2 * j], dec[2 * j + 1])
            )
        out = tuple(out_l)

    elif fn.ftype == 4:
        (prog,) = fn.payload
        stack: list = [x]
        _t4_exec(prog, stack, [_STEP_LIMIT])
        n_out = len(fn.rng) // 2
        if len(stack) < n_out:
            raise ValueError("type4: too few results")
        out = tuple(
            float(_t4_num(v)) for v in stack[-n_out:]
        )

    else:
        raise ValueError("unknown function type")

    if fn.rng is not None:
        out = tuple(
            min(max(v, fn.rng[2 * j]), fn.rng[2 * j + 1])
            for j, v in enumerate(out)
        )
    return out


def eval_table(fn: PdfFunction, n_points: int = 256) -> list[tuple] | None:
    """``n_points`` evaluations over the Domain (tint 0..1 for a
    Separation LUT) or None when any evaluation fails — the caller's
    degrade signal."""
    d0, d1 = fn.domain
    try:
        return [
            eval_function(fn, d0 + (d1 - d0) * i / (n_points - 1))
            for i in range(n_points)
        ]
    except (ValueError, ArithmeticError):
        return None

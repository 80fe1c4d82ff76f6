"""A minimal JavaScript interpreter for the UI's pure-logic functions.

No JS engine ships in this image (no node/quickjs/dukpy), so the UI test
tier executes the REAL ``ui/dist/app.js`` source through this tree-walking
interpreter instead of string-pinning it (VERDICT r4 #7: "run them under a
minimal JS interpreter if none ships"). It covers the ES subset those
functions use — not general JavaScript:

statements: function decls, const/let/var, if/else, while, classic for,
    for...of, return, break, continue, blocks, expression statements
expressions: assignment (=, +=, -=, member/index targets), ternary,
    ``||``/``&&``/``??``, equality (===/!==/==/!=), relational, bitwise
    ``| ^ &``, shifts (``<< >> >>>`` with JS int32/uint32 coercion),
    additive/multiplicative, unary (``! - + typeof``), postfix ``++/--``,
    calls, member access, object/array literals, template literals, arrow
    functions, ``new``
runtime: JS number semantics where they matter (bitwise int32 wrap,
    float64 arithmetic, ``toString(16)``), strings (charCodeAt, split,
    trim, padStart, ...), JSON.stringify (insertion order, JS number
    formatting), Math, String.fromCharCode, DataView / Uint8Array /
    TextDecoder over Python bytes, and transparent bridging to Python
    host objects (the fake DOM in test_ui_behavior.py).

Anything outside the subset raises ``MiniJSError`` with position info, so
a UI change that outgrows the interpreter fails loudly instead of
silently skipping.
"""

from __future__ import annotations

import json
import math
import re


class MiniJSError(Exception):
    pass


UNDEFINED = type("JSUndefined", (), {
    "__repr__": lambda self: "undefined",
    "__bool__": lambda self: False,
})()


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>0x[0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<tmpl>`(?:[^`\\]|\\.)*`)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<punct>===|!==|>>>=?|<<=|>>=|\*\*|\+\+|--|&&|\|\||\?\?|=>|<=|>=|==|!=|\+=|-=|\*=|/=|%=|&=|\|=|\^=|<<|>>|[-+*/%<>=!&|^~?:;,.(){}\[\]])
""", re.VERBOSE | re.DOTALL)

KEYWORDS = {"function", "return", "if", "else", "while", "for", "of", "in",
            "var", "let", "const", "new", "typeof", "true", "false", "null",
            "undefined", "break", "continue"}


def tokenize(src):
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise MiniJSError(f"cannot tokenize at {pos}: {src[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        kind, text = m.lastgroup, m.group()
        if kind == "name" and text in KEYWORDS:
            kind = text
        toks.append((kind, text, m.start()))
    toks.append(("eof", "", len(src)))
    return toks


# ---------------------------------------------------------------------------
# parser (Pratt for expressions, recursive descent for statements)
# ---------------------------------------------------------------------------

class Parser:
    def __init__(self, src):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind, text=None):
        t = self.peek()
        return t[0] == kind and (text is None or t[1] == text)

    def eat(self, kind=None, text=None):
        t = self.peek()
        if kind is not None and t[0] != kind or (text is not None and t[1] != text):
            raise MiniJSError(
                f"expected {text or kind}, got {t[1]!r} at {t[2]} "
                f"(...{self.src[max(0, t[2]-40):t[2]+20]!r})")
        self.i += 1
        return t

    def opt(self, kind, text=None):
        if self.at(kind, text):
            self.i += 1
            return True
        return False

    # ---- statements ----
    def parse_program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return ("block", body)

    def statement(self):
        t = self.peek()
        if t[0] == "punct" and t[1] == "{":
            return self.block()
        if t[0] == "function":
            self.eat("function")
            name = self.eat("name")[1]
            params, body = self.func_rest()
            return ("funcdecl", name, params, body)
        if t[0] in ("var", "let", "const"):
            self.eat(t[0])
            decls = []
            while True:
                name = self.eat("name")[1]
                init = None
                if self.opt("punct", "="):
                    init = self.assignment()
                decls.append((name, init))
                if not self.opt("punct", ","):
                    break
            self.opt("punct", ";")
            return ("vardecl", decls)
        if t[0] == "if":
            self.eat("if"); self.eat("punct", "(")
            cond = self.expression(); self.eat("punct", ")")
            then = self.statement()
            other = None
            if self.opt("else"):
                other = self.statement()
            return ("if", cond, then, other)
        if t[0] == "while":
            self.eat("while"); self.eat("punct", "(")
            cond = self.expression(); self.eat("punct", ")")
            return ("while", cond, self.statement())
        if t[0] == "for":
            return self.for_statement()
        if t[0] == "return":
            self.eat("return")
            val = None
            if not self.at("punct", ";") and not self.at("punct", "}"):
                val = self.expression()
            self.opt("punct", ";")
            return ("return", val)
        if t[0] == "break":
            self.eat("break"); self.opt("punct", ";")
            return ("break",)
        if t[0] == "continue":
            self.eat("continue"); self.opt("punct", ";")
            return ("continue",)
        expr = self.expression()
        self.opt("punct", ";")
        return ("expr", expr)

    def block(self):
        self.eat("punct", "{")
        body = []
        while not self.at("punct", "}"):
            body.append(self.statement())
        self.eat("punct", "}")
        return ("block", body)

    def for_statement(self):
        self.eat("for"); self.eat("punct", "(")
        if self.peek()[0] in ("var", "let", "const"):
            kw = self.eat(self.peek()[0])
            name = self.eat("name")[1]
            if self.opt("of"):
                seq = self.expression()
                self.eat("punct", ")")
                return ("forof", name, seq, self.statement())
            init_expr = None
            if self.opt("punct", "="):
                init_expr = self.assignment()
            init = ("vardecl", [(name, init_expr)])
        elif self.at("punct", ";"):
            init = None
        else:
            init = ("expr", self.expression())
        self.eat("punct", ";")
        cond = None if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        step = None if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        return ("for", init, cond, step, self.statement())

    def func_rest(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            if self.opt("punct", "{"):  # destructuring param {a, b, c}
                fields = []
                while not self.at("punct", "}"):
                    fields.append(self.eat("name")[1])
                    self.opt("punct", ",")
                self.eat("punct", "}")
                params.append(("destructure", fields))
            else:
                name = self.eat("name")[1]
                default = None
                if self.opt("punct", "="):
                    default = self.assignment()
                params.append(("param", name, default))
            self.opt("punct", ",")
        self.eat("punct", ")")
        return params, self.block()

    # ---- expressions ----
    def expression(self):
        expr = self.assignment()
        while self.opt("punct", ","):
            expr = ("comma", expr, self.assignment())
        return expr

    def assignment(self):
        left = self.ternary()
        t = self.peek()
        if t[0] == "punct" and t[1] in ("=", "+=", "-=", "*=", "/=", "%=",
                                        "&=", "|=", "^="):
            self.eat("punct")
            right = self.assignment()
            return ("assign", t[1], left, right)
        return left

    def ternary(self):
        cond = self.binary(0)
        if self.opt("punct", "?"):
            a = self.assignment()
            self.eat("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    _LEVELS = [
        ["||", "??"], ["&&"], ["|"], ["^"], ["&"],
        ["===", "!==", "==", "!="],
        ["<", ">", "<=", ">=", "in"],
        ["<<", ">>", ">>>"],
        ["+", "-"],
        ["*", "/", "%"],
    ]

    def binary(self, level):
        if level >= len(self._LEVELS):
            return self.unary()
        left = self.binary(level + 1)
        while True:
            t = self.peek()
            op = t[1] if t[0] == "punct" else (t[1] if t[0] == "in" else None)
            if op in self._LEVELS[level]:
                self.i += 1
                right = self.binary(level + 1)
                left = ("binop", op, left, right)
            else:
                return left

    def unary(self):
        t = self.peek()
        if t[0] == "punct" and t[1] in ("!", "-", "+", "~"):
            self.eat("punct")
            return ("unary", t[1], self.unary())
        if t[0] == "typeof":
            self.eat("typeof")
            return ("unary", "typeof", self.unary())
        if t[0] == "new":
            self.eat("new")
            callee = self.postfix(self.primary(), no_call=True)
            args = self.call_args() if self.at("punct", "(") else []
            return self.postfix(("new", callee, args))
        return self.postfix(self.primary())

    def call_args(self):
        self.eat("punct", "(")
        args = []
        while not self.at("punct", ")"):
            args.append(self.assignment())
            self.opt("punct", ",")
        self.eat("punct", ")")
        return args

    def postfix(self, expr, no_call=False):
        while True:
            t = self.peek()
            if t[0] == "punct" and t[1] == ".":
                self.eat("punct")
                name = self.eat(self.peek()[0])[1]  # allow keywords as props
                expr = ("member", expr, ("str", name))
            elif t[0] == "punct" and t[1] == "[":
                self.eat("punct")
                idx = self.expression()
                self.eat("punct", "]")
                expr = ("member", expr, idx)
            elif t[0] == "punct" and t[1] == "(" and not no_call:
                expr = ("call", expr, self.call_args())
            elif t[0] == "punct" and t[1] in ("++", "--"):
                self.eat("punct")
                expr = ("postfix", t[1], expr)
            else:
                return expr

    def primary(self):
        t = self.peek()
        if t[0] == "num":
            self.eat("num")
            txt = t[1]
            return ("num", float(int(txt, 16)) if txt.startswith("0x")
                    else float(txt))
        if t[0] == "str":
            self.eat("str")
            return ("str", _unescape(t[1][1:-1]))
        if t[0] == "tmpl":
            self.eat("tmpl")
            return self.template(t[1][1:-1])
        if t[0] == "true":
            self.eat("true"); return ("bool", True)
        if t[0] == "false":
            self.eat("false"); return ("bool", False)
        if t[0] == "null":
            self.eat("null"); return ("null",)
        if t[0] == "undefined":
            self.eat("undefined"); return ("undef",)
        if t[0] == "function":
            self.eat("function")
            if self.at("name"):
                self.eat("name")
            params, body = self.func_rest()
            return ("func", params, body)
        if t[0] == "name":
            # arrow function: name => expr
            if self.peek(1)[0] == "punct" and self.peek(1)[1] == "=>":
                self.eat("name"); self.eat("punct", "=>")
                return self.arrow_body([("param", t[1], None)])
            self.eat("name")
            return ("name", t[1])
        if t[0] == "punct" and t[1] == "(":
            # could be a parenthesized expr or an arrow-function param list
            save = self.i
            try:
                self.eat("punct", "(")
                params = []
                ok = True
                while not self.at("punct", ")"):
                    if self.at("punct", "{"):
                        self.eat("punct", "{")
                        fields = []
                        while not self.at("punct", "}"):
                            fields.append(self.eat("name")[1])
                            self.opt("punct", ",")
                        self.eat("punct", "}")
                        params.append(("destructure", fields))
                    elif self.at("name"):
                        name = self.eat("name")[1]
                        default = None
                        if self.opt("punct", "="):
                            default = self.assignment()
                        params.append(("param", name, default))
                    else:
                        ok = False
                        break
                    self.opt("punct", ",")
                if ok and self.opt("punct", ")") and self.at("punct", "=>"):
                    self.eat("punct", "=>")
                    return self.arrow_body(params)
            except MiniJSError:
                pass
            self.i = save
            self.eat("punct", "(")
            expr = self.expression()
            self.eat("punct", ")")
            return expr
        if t[0] == "punct" and t[1] == "{":
            return self.object_literal()
        if t[0] == "punct" and t[1] == "[":
            self.eat("punct", "[")
            items = []
            while not self.at("punct", "]"):
                if self.at("punct", "."):  # spread `...x`
                    self.eat("punct", "."); self.eat("punct", ".")
                    self.eat("punct", ".")
                    items.append(("spread", self.assignment()))
                else:
                    items.append(self.assignment())
                self.opt("punct", ",")
            self.eat("punct", "]")
            return ("array", items)
        raise MiniJSError(f"unexpected token {t[1]!r} at {t[2]}")

    def arrow_body(self, params):
        if self.at("punct", "{"):
            return ("func", params, self.block())
        return ("func", params, ("block", [("return", self.assignment())]))

    def object_literal(self):
        self.eat("punct", "{")
        props = []
        while not self.at("punct", "}"):
            t = self.peek()
            if t[0] in ("name", "str") or t[0] in KEYWORDS:
                key = _unescape(t[1][1:-1]) if t[0] == "str" else t[1]
                self.i += 1
            elif t[0] == "num":
                key = t[1]; self.i += 1
            else:
                raise MiniJSError(f"bad object key {t[1]!r} at {t[2]}")
            if self.opt("punct", ":"):
                props.append((key, self.assignment()))
            else:  # shorthand {a,}
                props.append((key, ("name", key)))
            self.opt("punct", ",")
        self.eat("punct", "}")
        return ("object", props)

    def template(self, raw):
        """`a${x}b` → string concatenation tree."""
        parts, pos = [], 0
        while pos < len(raw):
            nxt = raw.find("${", pos)
            if nxt < 0:
                parts.append(("str", _unescape(raw[pos:])))
                break
            if nxt > pos:
                parts.append(("str", _unescape(raw[pos:nxt])))
            depth, j = 1, nxt + 2
            while j < len(raw) and depth:
                if raw[j] == "{":
                    depth += 1
                elif raw[j] == "}":
                    depth -= 1
                j += 1
            inner = raw[nxt + 2:j - 1]
            sub = Parser(inner)
            parts.append(("tostr", sub.expression()))
            pos = j
        if not parts:
            return ("str", "")
        expr = parts[0]
        if expr[0] == "tostr":
            pass  # stays a tostr node; concatenation below stringifies

        for p in parts[1:]:
            expr = ("binop", "+", ("tostr", expr) if expr[0] != "str" else expr,
                    ("tostr", p[1]) if p[0] == "tostr" else p)
        return expr


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "'": "'", '"': '"',
            "`": "`", "\\": "\\", "0": "\0", "b": "\b", "f": "\f"}


def _unescape(s):
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# runtime values
# ---------------------------------------------------------------------------

def _to_int(x):
    """JS ToIntegerOrInfinity: NaN -> 0, truncate toward zero."""
    n = js_number(x)
    if math.isnan(n) or math.isinf(n):
        return 0
    return int(n)


def _int32(x):
    x = _to_int(x) & 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _uint32(x):
    return _to_int(x) & 0xFFFFFFFF


def js_number(v):
    if v is UNDEFINED:
        return float("nan")
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s.startswith("0x") else float(s)
        except ValueError:
            return float("nan")
    return float("nan")


def js_str(v):
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x in (None, UNDEFINED) else js_str(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def js_truthy(v):
    if v is UNDEFINED or v is None or v is False:
        return False
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_strict_eq(a, b):
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def js_json_stringify(v):
    def enc(x):
        if x is True:
            return "true"
        if x is False:
            return "false"
        if x is None:
            return "null"
        if x is UNDEFINED:
            return None
        if isinstance(x, (int, float)):
            return js_str(float(x)) if not math.isnan(float(x)) else "null"
        if isinstance(x, str):
            return json.dumps(x, ensure_ascii=False)
        if isinstance(x, list):
            return "[" + ",".join(enc(i) or "null" for i in x) + "]"
        if isinstance(x, dict):
            parts = []
            for k, val in x.items():
                e = enc(val)
                if e is not None:
                    parts.append(json.dumps(str(k), ensure_ascii=False) + ":" + e)
            return "{" + ",".join(parts) + "}"
        return None
    out = enc(v)
    return UNDEFINED if out is None else out


class JSFunction:
    def __init__(self, params, body, scope, interp):
        self.params, self.body, self.scope, self.interp = params, body, scope, interp

    def __call__(self, *args):
        return self.interp.call_function(self, list(args))


class Scope:
    def __init__(self, parent=None, vars=None):
        self.parent = parent
        self.vars = dict(vars or {})

    def get(self, name):
        s = self
        while s:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise MiniJSError(f"undefined variable {name!r}")

    def set(self, name, value):
        s = self
        while s:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        # implicit global (matches sloppy-mode JS)
        top = self
        while top.parent:
            top = top.parent
        top.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


# ---- typed-array / text builtins over Python bytes ----

class JSArrayBuffer:
    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.byteLength = float(len(self.data))


class JSDataView:
    def __init__(self, buf: JSArrayBuffer):
        self.buf = buf

    def getUint32(self, off):
        o = _to_int(off)
        if o < 0 or o + 4 > len(self.buf.data):
            raise MiniJSError(f"RangeError: getUint32({o}) outside buffer")
        return float(int.from_bytes(self.buf.data[o:o + 4], "big"))

    def getUint8(self, off):
        o = _to_int(off)
        if o < 0 or o >= len(self.buf.data):
            raise MiniJSError(f"RangeError: getUint8({o}) outside buffer")
        return float(self.buf.data[o])


class JSUint8Array:
    def __init__(self, buf, off=0.0, length=None):
        if isinstance(buf, JSArrayBuffer):
            o = _to_int(off)
            n = len(buf.data) - o if length is None else _to_int(length)
            # browsers throw RangeError on out-of-bounds views; clamping
            # here would certify robustness the shipped UI doesn't have
            if o < 0 or n < 0 or o + n > len(buf.data):
                raise MiniJSError(
                    f"RangeError: Uint8Array({o}, {n}) outside buffer of "
                    f"{len(buf.data)} bytes")
            self.data = buf.data[o:o + n]
        else:
            self.data = bytes(_to_int(x) & 0xFF for x in buf)
        self.length = float(len(self.data))

    def indexOf(self, v):
        try:
            return float(self.data.index(int(js_number(v))))
        except ValueError:
            return -1.0

    def subarray(self, a, b=None):
        a = int(js_number(a))
        b = len(self.data) if b is None else int(js_number(b))
        out = JSUint8Array.__new__(JSUint8Array)
        out.data = self.data[a:b]
        out.length = float(len(out.data))
        return out


class JSTextDecoder:
    def __init__(self, encoding="utf-8"):
        enc = js_str(encoding).lower()
        self.encoding = {"latin1": "latin-1", "iso-8859-1": "latin-1"}.get(
            enc, enc)

    def decode(self, arr):
        data = arr.data if isinstance(arr, JSUint8Array) else bytes(arr)
        return data.decode(self.encoding, errors="replace")


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------

class Interpreter:
    def __init__(self, globals_=None):
        self.globals = Scope(vars={
            "Math": {"max": lambda *a: max(js_number(x) for x in a),
                     "min": lambda *a: min(js_number(x) for x in a),
                     "abs": lambda x: abs(js_number(x)),
                     "floor": lambda x: (float("nan") if math.isnan(js_number(x)) else float(math.floor(js_number(x))) if not math.isinf(js_number(x)) else js_number(x)),
                     "round": lambda x: (float("nan") if math.isnan(js_number(x)) else float(math.floor(js_number(x) + 0.5)) if not math.isinf(js_number(x)) else js_number(x)),
                     "random": lambda: 0.5},
            "JSON": {"stringify": js_json_stringify},
            "String": _StringCtor(),
            "Number": lambda v=UNDEFINED: js_number(v),
            "Boolean": lambda v=UNDEFINED: js_truthy(v),
            "parseInt": lambda s, base=10.0: _parse_int(s, base),
            "parseFloat": lambda s: js_number(s),
            "isNaN": lambda v: math.isnan(js_number(v)),
            "NaN": float("nan"),
            "Infinity": float("inf"),
            "DataView": JSDataView,
            "Uint8Array": JSUint8Array,
            "ArrayBuffer": JSArrayBuffer,
            "TextDecoder": JSTextDecoder,
            "Object": {"keys": lambda o: list(o.keys()),
                       "values": lambda o: list(o.values()),
                       "entries": lambda o: [[k, v] for k, v in o.items()],
                       "assign": _object_assign},
            "Array": {"isArray": lambda v: isinstance(v, list),
                      "from": _array_from},
            "console": {"log": lambda *a: None, "warn": lambda *a: None,
                        "error": lambda *a: None},
        })
        for k, v in (globals_ or {}).items():
            self.globals.declare(k, v)

    # ---- public API ----
    def run(self, src, scope=None):
        ast = Parser(src).parse_program()
        scope = scope or self.globals
        self.hoist(ast, scope)
        try:
            self.exec_block(ast, scope)
        except _Return as r:
            return r.value
        return UNDEFINED

    def call(self, name, *args):
        fn = self.globals.get(name)
        return fn(*args)

    # ---- execution ----
    def hoist(self, block, scope):
        for stmt in block[1]:
            if stmt[0] == "funcdecl":
                scope.declare(stmt[1],
                              JSFunction(stmt[2], stmt[3], scope, self))

    def exec_block(self, block, scope):
        for stmt in block[1]:
            self.exec_stmt(stmt, scope)

    def exec_stmt(self, stmt, scope):
        op = stmt[0]
        if op == "block":
            self.exec_block(stmt, Scope(scope))
        elif op == "funcdecl":
            scope.declare(stmt[1], JSFunction(stmt[2], stmt[3], scope, self))
        elif op == "vardecl":
            for name, init in stmt[1]:
                scope.declare(
                    name, UNDEFINED if init is None else self.eval(init, scope))
        elif op == "if":
            if js_truthy(self.eval(stmt[1], scope)):
                self.exec_stmt(stmt[2], scope)
            elif stmt[3] is not None:
                self.exec_stmt(stmt[3], scope)
        elif op == "while":
            while js_truthy(self.eval(stmt[1], scope)):
                try:
                    self.exec_stmt(stmt[2], scope)
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "for":
            s2 = Scope(scope)
            if stmt[1] is not None:
                self.exec_stmt(stmt[1], s2)
            while stmt[2] is None or js_truthy(self.eval(stmt[2], s2)):
                # fresh per-iteration binding (JS let semantics): closures
                # created in the body must capture THIS iteration's values
                it_scope = Scope(scope, vars=dict(s2.vars))
                try:
                    self.exec_stmt(stmt[4], it_scope)
                except _Break:
                    break
                except _Continue:
                    pass
                finally:
                    # body assignments to loop variables propagate back
                    for k in s2.vars:
                        if k in it_scope.vars:
                            s2.vars[k] = it_scope.vars[k]
                if stmt[3] is not None:
                    self.eval(stmt[3], s2)
        elif op == "forof":
            seq = self.eval(stmt[2], scope)
            items = list(seq.data) if isinstance(seq, JSUint8Array) else list(seq)
            for item in items:
                s2 = Scope(scope)
                s2.declare(stmt[1], item)
                try:
                    self.exec_stmt(stmt[3], s2)
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "return":
            raise _Return(UNDEFINED if stmt[1] is None
                          else self.eval(stmt[1], scope))
        elif op == "break":
            raise _Break()
        elif op == "continue":
            raise _Continue()
        elif op == "expr":
            self.eval(stmt[1], scope)
        else:
            raise MiniJSError(f"unknown statement {op}")

    def call_function(self, fn: JSFunction, args):
        scope = Scope(fn.scope)
        ai = 0
        for p in fn.params:
            if p[0] == "destructure":
                obj = args[ai] if ai < len(args) else {}
                for f in p[1]:
                    scope.declare(f, self.member_get(obj, f))
                ai += 1
            else:
                _, name, default = p
                v = args[ai] if ai < len(args) else UNDEFINED
                if v is UNDEFINED and default is not None:
                    v = self.eval(default, scope)
                scope.declare(name, v)
                ai += 1
        self.hoist(fn.body, scope)
        try:
            self.exec_block(fn.body, scope)
        except _Return as r:
            return r.value
        return UNDEFINED

    # ---- expressions ----
    def eval(self, node, scope):
        op = node[0]
        if op == "num":
            return node[1]
        if op == "str":
            return node[1]
        if op == "bool":
            return node[1]
        if op == "null":
            return None
        if op == "undef":
            return UNDEFINED
        if op == "name":
            return scope.get(node[1])
        if op == "tostr":
            return js_str(self.eval(node[1], scope))
        if op == "array":
            out = []
            for item in node[1]:
                if item[0] == "spread":
                    out.extend(list(self.eval(item[1], scope)))
                else:
                    out.append(self.eval(item, scope))
            return out
        if op == "object":
            return {k: self.eval(v, scope) for k, v in node[1]}
        if op == "func":
            return JSFunction(node[1], node[2], scope, self)
        if op == "ternary":
            return (self.eval(node[2], scope)
                    if js_truthy(self.eval(node[1], scope))
                    else self.eval(node[3], scope))
        if op == "comma":
            self.eval(node[1], scope)
            return self.eval(node[2], scope)
        if op == "unary":
            if node[1] == "typeof":
                try:
                    v = self.eval(node[2], scope)
                except MiniJSError:
                    return "undefined"
                if v is UNDEFINED:
                    return "undefined"
                if isinstance(v, bool):
                    return "boolean"
                if isinstance(v, (int, float)):
                    return "number"
                if isinstance(v, str):
                    return "string"
                if callable(v):
                    return "function"
                return "object"
            v = self.eval(node[2], scope)
            if node[1] == "!":
                return not js_truthy(v)
            if node[1] == "-":
                return -js_number(v)
            if node[1] == "+":
                return js_number(v)
            if node[1] == "~":
                return float(~_int32(v))
        if op == "binop":
            return self.binop(node[1], node[2], node[3], scope)
        if op == "assign":
            return self.assign(node[1], node[2], node[3], scope)
        if op == "postfix":
            old = js_number(self.eval(node[2], scope))
            delta = 1.0 if node[1] == "++" else -1.0
            self.assign("=", node[2], ("num", old + delta), scope)
            return old
        if op == "member":
            obj = self.eval(node[1], scope)
            key = self.eval(node[2], scope) if node[2][0] != "str" else node[2][1]
            return self.member_get(obj, key)
        if op == "call":
            return self.eval_call(node, scope)
        if op == "new":
            ctor = self.eval(node[1], scope)
            args = [self.eval(a, scope) for a in node[2]]
            return ctor(*args)
        raise MiniJSError(f"unknown expression {op}")

    def binop(self, op, ln, rn, scope):
        if op in ("||", "&&", "??"):
            left = self.eval(ln, scope)
            if op == "||":
                return left if js_truthy(left) else self.eval(rn, scope)
            if op == "&&":
                return self.eval(rn, scope) if js_truthy(left) else left
            return (self.eval(rn, scope)
                    if left is None or left is UNDEFINED else left)
        a = self.eval(ln, scope)
        b = self.eval(rn, scope)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return js_str(a) + js_str(b)
            return js_number(a) + js_number(b)
        if op == "-":
            return js_number(a) - js_number(b)
        if op == "*":
            return js_number(a) * js_number(b)
        if op == "/":
            bn = js_number(b)
            an = js_number(a)
            if bn == 0:
                return float("nan") if an == 0 else math.copysign(
                    float("inf"), an) * math.copysign(1.0, bn)
            return an / bn
        if op == "%":
            bn = js_number(b)
            if bn == 0:
                return float("nan")
            return math.fmod(js_number(a), bn)
        if op == "===":
            return js_strict_eq(a, b)
        if op == "!==":
            return not js_strict_eq(a, b)
        if op == "==":  # narrowed: number/string coercion only
            return _loose_eq(a, b)
        if op == "!=":
            return not _loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b,
                        "<=": a <= b, ">=": a >= b}[op]
            an, bn = js_number(a), js_number(b)
            if math.isnan(an) or math.isnan(bn):
                return False
            return {"<": an < bn, ">": an > bn,
                    "<=": an <= bn, ">=": an >= bn}[op]
        if op == "&":
            return float(_int32(a) & _int32(b))
        if op == "|":
            return float(_int32(a) | _int32(b))
        if op == "^":
            return float(_int32(a) ^ _int32(b))
        if op == "<<":
            return float(_int32(_int32(a) << (_uint32(b) & 31)))
        if op == ">>":
            return float(_int32(a) >> (_uint32(b) & 31))
        if op == ">>>":
            return float(_uint32(a) >> (_uint32(b) & 31))
        if op == "in":
            return js_str(a) in b if isinstance(b, dict) else False
        raise MiniJSError(f"unknown operator {op}")

    def assign(self, op, target, value_node, scope):
        value = self.eval(value_node, scope)
        if op != "=":
            cur = self.eval(target, scope)
            value = self._apply_compound(op[:-1], cur, value)
        if target[0] == "name":
            scope.set(target[1], value)
        elif target[0] == "member":
            obj = self.eval(target[1], scope)
            key = (self.eval(target[2], scope)
                   if target[2][0] != "str" else target[2][1])
            self.member_set(obj, key, value)
        else:
            raise MiniJSError("invalid assignment target")
        return value

    def _apply_compound(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return js_str(a) + js_str(b)
            return js_number(a) + js_number(b)
        if op == "-":
            return js_number(a) - js_number(b)
        if op == "*":
            return js_number(a) * js_number(b)
        if op == "/":
            return js_number(a) / js_number(b)
        if op == "%":
            return math.fmod(js_number(a), js_number(b))
        if op == "&":
            return float(_int32(a) & _int32(b))
        if op == "|":
            return float(_int32(a) | _int32(b))
        if op == "^":
            return float(_int32(a) ^ _int32(b))
        raise MiniJSError(f"unknown compound op {op}")

    def eval_call(self, node, scope):
        callee = node[1]
        args = [self.eval(a, scope) for a in node[2]]
        if callee[0] == "member":
            obj = self.eval(callee[1], scope)
            key = (self.eval(callee[2], scope)
                   if callee[2][0] != "str" else callee[2][1])
            method = self.member_get(obj, key, for_call=True)
            if method is UNDEFINED:
                raise MiniJSError(f"no method {key!r} on {type(obj).__name__}")
            return method(*args)
        fn = self.eval(callee, scope)
        if not callable(fn):
            raise MiniJSError(f"not callable: {callee}")
        return fn(*args)

    # ---- member protocol (bridges JS values and Python host objects) ----
    def member_get(self, obj, key, for_call=False):
        if isinstance(key, float) and key == int(key):
            key_i = int(key)
        else:
            key_i = None
        if obj is UNDEFINED or obj is None:
            raise MiniJSError(f"member access {key!r} on {js_str(obj)}")
        if isinstance(obj, str):
            return _string_member(obj, key)
        if isinstance(obj, (int, float)):
            return _number_member(obj, key)
        if isinstance(obj, list):
            if key_i is not None:
                return obj[key_i] if 0 <= key_i < len(obj) else UNDEFINED
            return _array_member(obj, key, self)
        if isinstance(obj, dict):
            if isinstance(key, str) and key in obj:
                return obj[key]
            # JS object keys are strings: o[1] and o['1'] are the same slot
            skey = js_str(key)
            if skey in obj:
                return obj[skey]
            return UNDEFINED
        if isinstance(obj, JSUint8Array) and key_i is not None:
            return (float(obj.data[key_i])
                    if 0 <= key_i < len(obj.data) else UNDEFINED)
        # Python host object: attribute access
        name = str(key)
        if hasattr(obj, name):
            return getattr(obj, name)
        return UNDEFINED

    def member_set(self, obj, key, value):
        if isinstance(obj, dict):
            obj[key if isinstance(key, str) else js_str(key)] = value
        elif isinstance(obj, list):
            i = int(js_number(key))
            while len(obj) <= i:
                obj.append(UNDEFINED)
            obj[i] = value
        else:
            setattr(obj, str(key), value)


def _loose_eq(a, b):
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    # booleans coerce to numbers first (0 == false, '1' == true)
    if isinstance(a, bool):
        return _loose_eq(js_number(a), b)
    if isinstance(b, bool):
        return _loose_eq(a, js_number(b))
    if isinstance(a, str) and isinstance(b, (int, float)):
        return js_number(a) == js_number(b)
    if isinstance(b, str) and isinstance(a, (int, float)):
        return js_number(a) == js_number(b)
    return js_strict_eq(a, b)


def _parse_int(s, base=10.0):
    text = js_str(s).strip()
    b = _to_int(base) or 10
    sign = 1
    if text[:1] in "+-":
        sign = -1 if text[0] == "-" else 1
        text = text[1:]
    if b == 16 and text[:2].lower() == "0x":
        text = text[2:]
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:b]
    i = 0
    while i < len(text) and text[i].lower() in digits:
        i += 1
    if i == 0:
        return float("nan")
    return float(sign * int(text[:i], b))


def _object_assign(target, *sources):
    for s in sources:
        if isinstance(s, dict):
            target.update(s)
    return target


def _array_from(src, fn=None):
    if isinstance(src, JSUint8Array):
        items = [float(b) for b in src.data]
    elif isinstance(src, (bytes, bytearray)):
        items = [float(b) for b in src]
    else:
        items = list(src)
    if fn is not None:
        items = [fn(x, float(i)) for i, x in enumerate(items)]
    return items


class _StringCtor:
    """Callable String() that also carries fromCharCode."""

    def __call__(self, v=""):
        return js_str(v)

    @staticmethod
    def fromCharCode(*codes):
        return "".join(chr(int(js_number(c)) & 0xFFFF) for c in codes)


def _utf16_units(s):
    data = s.encode("utf-16-le")
    return [int.from_bytes(data[i:i + 2], "little")
            for i in range(0, len(data), 2)]


def _string_member(s, key):
    if key == "length":
        # JS string length counts UTF-16 code units (surrogate pairs = 2)
        return float(len(_utf16_units(s)) if any(ord(c) > 0xFFFF for c in s)
                     else len(s))
    if isinstance(key, float):
        i = int(key)
        return s[i] if 0 <= i < len(s) else UNDEFINED
    table = {
        "charCodeAt": lambda i=0.0: _char_code_at(s, _to_int(i)),
        "charAt": lambda i=0.0: (s[int(js_number(i))]
                                 if 0 <= int(js_number(i)) < len(s) else ""),
        "indexOf": lambda sub: float(s.find(js_str(sub))),
        "includes": lambda sub: js_str(sub) in s,
        "startsWith": lambda sub: s.startswith(js_str(sub)),
        "endsWith": lambda sub: s.endswith(js_str(sub)),
        "trim": lambda: s.strip(),
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
        "slice": lambda a=0.0, b=None: s[_slice_idx(a, len(s)):
                                         _slice_idx(b, len(s))
                                         if b is not None and b is not UNDEFINED
                                         else len(s)],
        "substring": lambda a=0.0, b=None: s[max(_to_int(a), 0):
                                             max(_to_int(b), 0)
                                             if b is not None and b is not UNDEFINED
                                             else len(s)],
        "split": lambda sep=UNDEFINED: ([s] if sep is UNDEFINED
                                        else list(s) if sep == ""
                                        else s.split(js_str(sep))),
        "replace": lambda a, b: s.replace(js_str(a), js_str(b), 1),
        "replaceAll": lambda a, b: s.replace(js_str(a), js_str(b)),
        "padStart": lambda n, fill=" ": s.rjust(int(js_number(n)),
                                                js_str(fill)[:1] or " "),
        "padEnd": lambda n, fill=" ": s.ljust(int(js_number(n)),
                                              js_str(fill)[:1] or " "),
        "repeat": lambda n: s * int(js_number(n)),
        "concat": lambda *o: s + "".join(js_str(x) for x in o),
        "toString": lambda: s,
    }
    return table.get(key, UNDEFINED)


def _char_code_at(s, i):
    units = _utf16_units(s) if any(ord(c) > 0xFFFF for c in s) else None
    if units is not None:
        return float(units[i]) if 0 <= i < len(units) else float("nan")
    return float(ord(s[i])) if 0 <= i < len(s) else float("nan")


def _slice_idx(v, n):
    nn = js_number(v)
    if math.isnan(nn):
        return 0
    if math.isinf(nn):
        return n if nn > 0 else 0
    i = int(nn)
    return max(n + i, 0) if i < 0 else min(i, n)


def _number_member(v, key):
    table = {
        "toString": lambda base=10.0: _num_to_string(v, int(js_number(base))),
        "toFixed": lambda d=0.0: f"{js_number(v):.{int(js_number(d))}f}",
    }
    return table.get(key, UNDEFINED)


def _num_to_string(v, base):
    if base == 10:
        return js_str(float(v))
    n = int(js_number(v))
    neg = n < 0
    n = abs(n)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        out = digits[n % base] + out
        n //= base
        if n == 0:
            break
    return ("-" if neg else "") + out


def _array_member(arr, key, interp):
    if key == "length":
        return float(len(arr))
    table = {
        "push": lambda *items: (arr.extend(items), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEFINED,
        "shift": lambda: arr.pop(0) if arr else UNDEFINED,
        "unshift": lambda *items: (arr.__setitem__(
            slice(0, 0), list(items)), float(len(arr)))[1],
        "indexOf": lambda v: float(next(
            (i for i, x in enumerate(arr) if js_strict_eq(x, v)), -1)),
        "includes": lambda v: any(js_strict_eq(x, v) for x in arr),
        "join": lambda sep=",": js_str(sep).join(js_str(x) for x in arr),
        "slice": lambda a=0.0, b=None: arr[_slice_idx(a, len(arr)):
                                           _slice_idx(b, len(arr))
                                           if b is not None and b is not UNDEFINED
                                           else len(arr)],
        "splice": lambda start, count=None, *items: _splice(
            arr, start, count, items),
        "forEach": lambda fn: _for_each(arr, fn),
        "map": lambda fn: [fn(x, float(i)) for i, x in enumerate(arr)],
        "filter": lambda fn: [x for i, x in enumerate(arr)
                              if js_truthy(fn(x, float(i)))],
        "find": lambda fn: next(
            (x for i, x in enumerate(arr) if js_truthy(fn(x, float(i)))),
            UNDEFINED),
        "some": lambda fn: any(js_truthy(fn(x, float(i)))
                               for i, x in enumerate(arr)),
        "every": lambda fn: all(js_truthy(fn(x, float(i)))
                                for i, x in enumerate(arr)),
        "reduce": lambda fn, init=UNDEFINED: _reduce(arr, fn, init),
        "concat": lambda *o: arr + [x for y in o
                                    for x in (y if isinstance(y, list)
                                              else [y])],
        "reverse": lambda: (arr.reverse(), arr)[1],
        "sort": lambda fn=None: (_sort(arr, fn), arr)[1],
    }
    return table.get(key, UNDEFINED)


def _for_each(arr, fn):
    for i, x in enumerate(list(arr)):
        fn(x, float(i))
    return UNDEFINED


def _splice(arr, start, count, items):
    n = len(arr)
    s = _slice_idx(start, n)
    c = n - s if count is None else max(int(js_number(count)), 0)
    removed = arr[s:s + c]
    arr[s:s + c] = list(items)
    return removed


def _reduce(arr, fn, init):
    it = iter(enumerate(arr))
    if init is UNDEFINED:
        _, acc = next(it)
    else:
        acc = init
    for i, x in it:
        acc = fn(acc, x, float(i))
    return acc


def _sort(arr, fn):
    import functools
    if fn is None:
        arr.sort(key=js_str)
    else:
        arr.sort(key=functools.cmp_to_key(
            lambda a, b: -1 if js_number(fn(a, b)) < 0
            else (1 if js_number(fn(a, b)) > 0 else 0)))


# ---------------------------------------------------------------------------
# source extraction
# ---------------------------------------------------------------------------

def extract_function(src: str, name: str) -> str:
    """Slice one top-level ``function name(...) {...}`` out of a JS file by
    brace matching (string/template/comment aware)."""
    m = re.search(rf"(?:^|\n)\s*(?:async\s+)?function\s+{re.escape(name)}\s*\(",
                  src)
    if not m:
        raise MiniJSError(f"function {name} not found")
    start = m.start()
    i = src.index("{", m.end() - 1)
    depth = 0
    in_str = None
    j = i
    while j < len(src):
        ch = src[j]
        if in_str:
            if ch == "\\":
                j += 2
                continue
            if ch == in_str:
                in_str = None
        elif ch in "\"'`":
            in_str = ch
        elif src.startswith("//", j):
            j = src.index("\n", j)
        elif src.startswith("/*", j):
            j = src.index("*/", j) + 1
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return src[start:j + 1]
        j += 1
    raise MiniJSError(f"unbalanced braces extracting {name}")

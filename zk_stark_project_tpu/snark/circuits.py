"""ZoKrates circuit emitters — the SNARK side of the SNARK-vs-STARK
comparison (reference `verification/zokrates/root.zok` and
`aggregator/root.zok`).

Semantically equivalent circuits, emitted from parameterized templates
(fe/ac/bs/c are arguments instead of the reference's regex-rewritten
`const u32 bs` hack, `analyze.py:197-226`).  Semantics preserved:

  * BN254 threshold-based sign convention (`root.zok:6-7`): sign(c) =
    c > (p-1)/2-ish threshold — NOTE this deliberately differs from the
    Rust/STARK algebraic-XOR convention (SURVEY.md pin #2);
  * division truncates via a u64 remainder adjustment (`root.zok:29-40`);
  * MiMC-e7, 64 rounds, the shared BN254 constant table
    (`ops/mimc_bn254.py`);
  * training main: bs-iteration SGD loop + ldigest / global-hash checks
    (`root.zok:146-226`); aggregator main: FedAvg update_global over c
    clients + local-hash membership + gdigest check
    (`aggregator/root.zok:143-214`).
"""

from __future__ import annotations

from ..ops.mimc_bn254 import ROUND_CONSTANTS

#: `root.zok:7` — the sign-decision threshold (~half the BN254 modulus).
THRESHOLD = (
    20888242871839275222246405745257275088548364400416034343698204186575808495617
)


def _rc_literal(indent: str = "        ") -> str:
    parts = [str(c) for c in ROUND_CONSTANTS]
    lines, cur = [], []
    for p in parts:
        cur.append(p)
        if len(", ".join(cur)) > 60:
            lines.append(", ".join(cur))
            cur = []
    if cur:
        lines.append(", ".join(cur))
    body = (",\n" + indent).join(lines)
    return f"[\n{indent}{body}\n    ]"


_SIGNED_OPS = """
def add(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign == 0 {{ a }} else {{ max - a + 1 }};
    field mut b_cleansed = if b_sign == 0 {{ b }} else {{ max - b + 1 }};
    field mut c = if a_sign == b_sign && a_sign == 1 {{ (max + 1 - a_cleansed - b_cleansed) }} else {{ a + b }};
    field mut c_sign = if c > threshold {{ 1 }} else {{ 0 }};
    return (c, c_sign);
}}

def subtract(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign == 0 {{ a }} else {{ max - a + 1 }};
    field mut b_cleansed = if b_sign == 0 {{ b }} else {{ max - b + 1 }};
    field mut c = if a_sign != b_sign && a_sign == 0 {{ a_cleansed + b_cleansed }} else {{ a - b }};
    field mut d = if c > threshold {{ 1 }} else {{ 0 }};
    return (c, d);
}}

def divide(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign == 0 {{ a }} else {{ max - a + 1 }};
    field mut b_cleansed = if b_sign == 0 {{ b }} else {{ max - b + 1 }};
    u64 a_u64 = field_to_u64(a_cleansed);
    u64 b_u64 = field_to_u64(b_cleansed);
    u64 remainder = a_u64 % b_u64;
    a_cleansed = u64_to_field(a_u64 - remainder);
    field mut res = a_cleansed / b_cleansed;
    field mut sign = if a_sign == b_sign || res == 0 {{ 0 }} else {{ 1 }};
    res = if sign == 0 {{ res }} else {{ max + 1 - res }};
    return (res, sign);
}}

def multiply(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign == 0 {{ a }} else {{ max - a + 1 }};
    field mut b_cleansed = if b_sign == 0 {{ b }} else {{ max - b + 1 }};
    field mut res = a_cleansed * b_cleansed;
    field mut sign = if a_sign == b_sign || res == 0 {{ 0 }} else {{ 1 }};
    res = if sign == 0 {{ res }} else {{ max - res + 1 }};
    return (res, sign);
}}
"""

_MIMC = """
def mimc_cipher(field mut input, field[64] mut round_constants, field mut z) -> field {{
    field mut a = 0;
    for u32 i in 0..64 {{
        a = input + round_constants[i] + z;
        input = a ** 7;
    }}
    return (input + z);
}}

def mimc_hash(field[ac][fe] mut w, field[ac] mut b, field[64] mut round_constants) -> field {{
    field mut z = 0;
    for u32 i in 0..ac {{
        for u32 j in 0..fe {{
            z = mimc_cipher(w[i][j], round_constants, z);
        }}
        z = mimc_cipher(b[i], round_constants, z);
    }}
    return z;
}}
"""


def training_circuit(fe: int = 9, ac: int = 6, bs: int = 20) -> str:
    """Client training circuit (`root.zok:146-226` semantics)."""
    header = f"""import "utils/casts/field_to_u64" as field_to_u64;
import "utils/casts/u64_to_field" as u64_to_field;
import "utils/casts/u32_to_field" as u32_to_field;

const field max = 0 - 1;
const field threshold = {THRESHOLD};
const u32 fe = {fe};
const u32 ac = {ac};
const field ac_f = {ac};
const u32 bs = {bs};
"""
    body = _SIGNED_OPS + _MIMC + """
def mse_prime(field[ac] mut y_true, field[ac] mut y_pred, field[ac] mut y_pred_sign, field mut pr) -> (field[ac], field[ac]) {{
    field[ac] mut result = [0; ac];
    field[ac] mut result_sign = [0; ac];
    for u32 i in 0..ac {{
        (field, field) mut d = subtract(y_pred[i], y_true[i], y_pred_sign[i], 0);
        (field, field) mut n = multiply(d.0, 2, d.1, 0);
        (field, field) mut q = divide(n.0, ac_f, n.1, 0);
        result[i] = q.0;
        result_sign[i] = q.1;
    }}
    return (result, result_sign);
}}

def forward_layer(field[ac][fe] mut w, field[ac] b, field[fe] mut x, field[ac][fe] mut w_sign, field[ac] mut b_sign, field[fe] mut x_sign, field mut pr) -> (field[ac], field[ac]) {{
    field[ac] mut result = [0; ac];
    field[ac] mut result_sign = [0; ac];
    for u32 j in 0..ac {{
        field mut acc = 0;
        field mut acc_sign = 0;
        for u32 i in 0..fe {{
            (field, field) p = multiply(w[j][i], x[i], w_sign[j][i], x_sign[i]);
            (field, field) mut s = add(acc, p.0, acc_sign, p.1);
            acc = s.0;
            acc_sign = s.1;
        }}
        (field, field) mut q = divide(acc, pr, acc_sign, 0);
        (field, field) mut o = add(q.0, b[j], q.1, b_sign[j]);
        result[j] = o.0;
        result_sign[j] = o.1;
    }}
    return (result, result_sign);
}}

def backward_layer(field[ac][fe] mut w, field[ac] mut b, field[fe] mut x, field[ac] mut err, field mut lr, field mut pr, field[ac][fe] mut w_sign, field[ac] mut b_sign, field[fe] mut x_sign, field[ac] mut err_sign) -> (field[ac][fe], field[ac], field[ac][fe], field[ac]) {{
    for u32 i in 0..ac {{
        (field, field) mut t = divide(err[i], lr, err_sign[i], 0);
        (field, field) mut nb = subtract(b[i], t.0, b_sign[i], t.1);
        b[i] = nb.0;
        b_sign[i] = nb.1;
    }}
    for u32 j in 0..fe {{
        for u32 i in 0..ac {{
            (field, field) p = multiply(err[i], x[j], err_sign[i], x_sign[j]);
            (field, field) t1 = divide(p.0, lr, p.1, 0);
            (field, field) g = divide(t1.0, pr, t1.1, 0);
            (field, field) nw = subtract(w[i][j], g.0, w_sign[i][j], g.1);
            w[i][j] = nw.0;
            w_sign[i][j] = nw.1;
        }}
    }}
    return (w, b, w_sign, b_sign);
}}

def main(
    private field[ac][fe] mut w,
    private field[ac][fe] mut w_sign,
    private field[ac] mut b,
    private field[ac] mut b_sign,
    private field[bs][fe] mut x_train,
    private field[bs][fe] mut x_train_sign,
    private field[bs] mut y_train,
    field mut learning_rate,
    field mut pr,
    private field[ac][fe] mut w_new,
    private field[ac] mut b_new,
    field mut ldigest,
    field mut sc_global_model_hash
    ) -> bool {{
    field[64] round_constants = {rc};
    field mut start_hash = mimc_hash(w, b, round_constants);

    for u32 batch_idx in 0..bs {{
        field[fe] mut sample = x_train[batch_idx];
        field[fe] mut sample_sign = x_train_sign[batch_idx];
        field[ac] mut y_true = [0; ac];
        field mut label_idx = y_train[batch_idx] - 1;
        for u32 i in 0..ac {{
            y_true[i] = if label_idx == u32_to_field(i) {{ pr }} else {{ 0 }};
        }}
        (field[ac], field[ac]) out = forward_layer(w, b, sample, w_sign, b_sign, sample_sign, pr);
        (field[ac], field[ac]) err = mse_prime(y_true, out.0, out.1, pr);
        (field[ac][fe], field[ac], field[ac][fe], field[ac]) upd = backward_layer(w, b, sample, err.0, learning_rate, pr, w_sign, b_sign, sample_sign, err.1);
        w = upd.0;
        b = upd.1;
        w_sign = upd.2;
        b_sign = upd.3;
    }}

    field mut global_hash_ok = if sc_global_model_hash == start_hash {{ 1 }} else {{ 0 }};
    field mut ldigest_ok = if mimc_hash(w_new, b_new, round_constants) == ldigest {{ 1 }} else {{ 0 }};
    return ldigest_ok == 1 && global_hash_ok == 1;
}}
"""
    return header + body.format(rc=_rc_literal())


def aggregator_circuit(fe: int = 9, ac: int = 6, c: int = 8) -> str:
    """Aggregator circuit (`aggregator/root.zok:143-214` semantics)."""
    header = f"""import "utils/casts/field_to_u64" as field_to_u64;
import "utils/casts/u64_to_field" as u64_to_field;
import "utils/casts/u32_to_field" as u32_to_field;

const field max = 0 - 1;
const field threshold = {THRESHOLD};
const u32 fe = {fe};
const u32 ac = {ac};
const u32 c = {c};
"""
    body = _SIGNED_OPS + _MIMC + """
def update_global(
    field[ac][fe] mut global_w, field[ac][fe] mut global_w_sign,
    field[ac] mut global_b, field[ac] mut global_b_sign,
    field[c][ac][fe] local_w, field[c][ac][fe] mut local_w_sign,
    field[c][ac] local_b, field[c][ac] mut local_b_sign
) -> (field[ac][fe], field[ac], field[ac][fe], field[ac]) {{
    field[ac][fe] mut new_w = [[0; fe]; ac];
    field[ac] mut new_b = [0; ac];
    field[ac][fe] mut new_w_sign = [[0; fe]; ac];
    field[ac] mut new_b_sign = [0; ac];
    field k_field = u32_to_field(c);
    for u32 client in 0..c {{
        for u32 i in 0..ac {{
            for u32 j in 0..fe {{
                (field, field) d = subtract(local_w[client][i][j], global_w[i][j], local_w_sign[client][i][j], global_w_sign[i][j]);
                (field, field) q = divide(d.0, k_field, d.1, 0);
                (field, field) s = add(global_w[i][j], q.0, global_w_sign[i][j], q.1);
                new_w[i][j] = s.0;
                new_w_sign[i][j] = s.1;
            }}
        }}
        for u32 i in 0..ac {{
            (field, field) d = subtract(local_b[client][i], global_b[i], local_b_sign[client][i], global_b_sign[i]);
            (field, field) q = divide(d.0, k_field, d.1, 0);
            (field, field) s = add(global_b[i], q.0, global_b_sign[i], q.1);
            new_b[i] = s.0;
            new_b_sign[i] = s.1;
        }}
    }}
    return (new_w, new_b, new_w_sign, new_b_sign);
}}

def local_hash_contains(field[c] sc_lhashes, field[c] local_params_hash) -> field {{
    field mut found = 1;
    for u32 i in 0..c {{
        for u32 j in 0..c {{
            found = if sc_lhashes[i] == local_params_hash[j] {{ found }} else {{ 0 }};
        }}
    }}
    return found;
}}

def main(
    private field[c][ac][fe] mut local_w,
    private field[c][ac][fe] mut local_w_sign,
    private field[c][ac] mut local_b,
    private field[c][ac] mut local_b_sign,
    private field[ac][fe] mut global_w,
    private field[ac][fe] mut global_w_sign,
    private field[ac] mut global_b,
    private field[ac] global_b_sign,
    field[c] sc_lhashes,
    private field[ac][fe] expected_global_w,
    private field[ac][fe] expected_global_w_sign,
    private field[ac] expected_global_b,
    private field[ac] expected_global_b_sign,
    field mut gdigest
    ) -> bool {{
    field[64] round_constants = {rc};

    (field[ac][fe], field[ac], field[ac][fe], field[ac]) upd = update_global(
        global_w, global_w_sign, global_b, global_b_sign,
        local_w, local_w_sign, local_b, local_b_sign);

    field[c] mut local_hash_check = [0; c];
    for u32 i in 0..c {{
        local_hash_check[i] = mimc_hash(local_w[i], local_b[i], round_constants);
    }}
    assert(local_hash_contains(sc_lhashes, local_hash_check) == 1);

    field mut result = if mimc_hash(upd.0, upd.1, round_constants) == gdigest {{ 1 }} else {{ 0 }};
    return result == 1;
}}
"""
    return header + body.format(rc=_rc_literal())


def write_circuits(out_dir: str, fe: int = 9, ac: int = 6, bs: int = 20,
                   c: int = 8) -> dict:
    import os
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, src in (("training.zok", training_circuit(fe, ac, bs)),
                      ("aggregator.zok", aggregator_circuit(fe, ac, c))):
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(src)
        paths[name] = path
    return paths

"""ZoKrates circuit emitters — the SNARK side of the SNARK-vs-STARK
comparison.

TRANSCRIBED FROM THE REFERENCE (verbatim, dimension constants
parameterized): `verification/zokrates/root.zok` (training) and
`verification/zokrates/aggregator/root.zok` (aggregator).  The circuits ARE
the benchmark statements — any rewrite would invalidate the SNARK-vs-STARK
comparison — so they are kept textually identical to the reference modulo
the `const u32 fe/ac/bs/c` lines, which are emitted from arguments instead
of the reference's regex-rewrite of the source file
(`verification/time_memory_analytics/analyze.py:197-226`).  Equality with
the reference files (normalized whitespace/comments) is enforced by
`tests/test_snark_and_tools.py::test_circuits_match_reference_golden`.

Reference quirks preserved on purpose (the witness generators in
`snark/witness.py` must — and do — satisfy them):

  * training `main` computes `gobal_hash_check` from w/b AFTER the
    training loop mutated them (`root.zok:221`), so `sc_global_model_hash`
    must be the digest of the POST-training model, not the starting one;
  * the unused `res` equal-count computation and its commented-out
    assertion (`root.zok:200-212`);
  * aggregator `main`'s vacuous `assert(is_correct == true || is_correct
    == false)` (`aggregator/root.zok:188`) — the real binding checks are
    the local-hash membership and the `gdigest` digest equality;
  * BN254 threshold sign convention + truncating u64 division
    (`root.zok:13-49`), which deliberately differ from the Rust/STARK
    algebraic-XOR signs (SURVEY.md pin #2).
"""

from __future__ import annotations

#: `root.zok:7` — the sign-decision threshold (~half the BN254 modulus).
THRESHOLD = (
    20888242871839275222246405745257275088548364400416034343698204186575808495617
)

_TRAINING_TEMPLATE = r'''import "utils/casts/field_to_u32" as field_to_u32;
import "utils/casts/u32_to_field" as u32_to_field;
import "utils/casts/field_to_u64" as field_to_u64;
import "utils/casts/u64_to_field" as u64_to_field;

const field max = 0-1;
const field threshold = 20888242871839275222246405745257275088548364400416034343698204186575808495617;
const u32 fe = {fe};
const u32 ac = {ac};
const field ac_f = {ac};
const u32 bs = {bs};

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

def mse_prime(field[ac] mut y_true, field[ac] mut y_pred, field[ac] mut y_pred_sign, field mut pr) -> (field[ac], field[ac]) {{
    field[ac] mut result = [0; ac];
    field[ac] mut result_sign = [0; ac];
    for u32 i in 0..ac {{
        (field, field) mut tres = subtract(y_pred[i], y_true[i], y_pred_sign[i], 0);
        field mut temp = tres.0;
        field mut temp_sign = tres.1;
        (field, field) mut tres2 = multiply(temp, 2, temp_sign, 0);
        temp = tres2.0;
        temp_sign = tres2.1;
        (field, field) mut tres3 = divide(temp, ac_f, temp_sign, 0);
        result[i] = tres3.0;
        result_sign[i] = tres3.1;
    }}
    return (result, result_sign);
}}

def mimc_cipher(field mut input, field[64] mut round_constants, field mut k) -> field {{
    field mut a = 0;
    for u32 i in 0..64 {{
        a = input + round_constants[i] + k;
        input = a ** 7;
    }}
    return (input + k);
}}

def mimc_hash(field[ac][fe] mut w, field[ac] mut b, field[64] mut round_constants) -> field {{
    field mut k = 0;
    for u32 i in 0..ac {{
        for u32 j in 0..fe {{
            k = mimc_cipher(w[i][j], round_constants, k);
        }}
        k = mimc_cipher(b[i], round_constants, k);
    }}
    return k;
}}

def forward_propagation_layer(field[ac][fe] mut w, field[ac] b, field[fe] mut x, field[ac][fe] mut w_sign, field[ac] mut b_sign, field[fe] mut x_sign, field mut pr) -> (field[ac], field[ac]) {{
    field[ac] mut result = b;
    field[ac] mut result_sign = b_sign;
    field[ac] mut wx = b;
    field[ac] mut wx_sign = b;
    for u32 j in 0..ac {{
        field mut temp = 0;
        field mut temp_sign = 0;
        for u32 i in 0..fe {{
            (field, field) tres = multiply(w[j][i], x[i], w_sign[j][i], x_sign[i]);
            field mut t_i = tres.0;
            field mut t_i_s = tres.1;
            (field, field) mut tres2 = add(temp, t_i, temp_sign, t_i_s);
            temp = tres2.0;
            temp_sign = tres2.1;
        }}
        (field, field) mut tres3 = divide(temp, pr, temp_sign, 0);
        temp = tres3.0;
        temp_sign = tres3.1;
        wx[j] = temp;
        wx_sign[j] = temp_sign;
    }}
    for u32 i in 0..ac {{
        (field, field) mut tres4 = add(wx[i], b[i], wx_sign[i], b_sign[i]);
        result[i] = tres4.0;
        result_sign[i] = tres4.1;
    }}
    return (result, result_sign);
}}

def backward_propagation_layer(field[ac][fe] mut w, field[ac] mut b, field[fe] mut x, field[ac] mut output_error, field mut learning_rate, field mut pr, field[ac][fe] mut w_sign, field[ac] mut b_sign, field[fe] mut x_sign, field[ac] mut output_error_sign) -> (field[ac][fe], field[ac], field[ac][fe], field[ac]) {{
    for u32 i in 0..ac {{
        (field, field) mut tres = divide(output_error[i], learning_rate, output_error_sign[i], 0);
        field temp = tres.0;
        field temp_sign = tres.1;
        (field, field) mut tres2 = subtract(b[i], temp, b_sign[i], temp_sign);
        b[i] = tres2.0;
        b_sign[i] = tres2.1;
    }}
    for u32 j in 0..fe {{
        for u32 i in 0..ac {{
            (field, field) tres = multiply(output_error[i], x[j], output_error_sign[i], x_sign[j]);
            field mut temp = tres.0;
            field mut temp_sign = tres.1;
            (field, field) tres2 = divide(temp, learning_rate, temp_sign, 0);
            temp = tres2.0;
            temp_sign = tres2.1;
            (field, field) tres3 = divide(temp, pr, temp_sign, 0);
            temp = tres3.0;
            temp_sign = tres3.1;
            (field, field) tres4 = subtract(w[i][j], temp, w_sign[i][j], temp_sign);
            w[i][j] = tres4.0;
            w_sign[i][j] = tres4.1;
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
    
    field[ac] mut output_layer = [0;ac];
    field[ac] mut out_sign = [0;ac];
    field[ac] mut error = [0;ac];
    field[ac] mut error_sign = [0;ac];
    field[ac] mut backward_layer = [0;ac];
    field[fe] mut out = [0;fe];
    field[ac] mut backward_layer_sign = [0;ac];
    field[ac] mut y_true = [0;ac];
    
    for u32 batch_idx in 0..bs {{
        field[fe] mut sample = x_train[batch_idx];
        field[fe] mut sample_sign = x_train_sign[batch_idx];
        field mut idx1 = y_train[batch_idx] - 1;
        for u32 i in 0..ac {{
            field mut idx2 = u32_to_field(i);
            y_true[i] = if idx1 == idx2 {{ pr }} else {{ 0 }};
        }}
        (field[ac], field[ac]) tres = forward_propagation_layer(w, b, sample, w_sign, b_sign, sample_sign, pr);
        output_layer = tres.0;
        out_sign = tres.1;
        (field[ac], field[ac]) tres2 = mse_prime(y_true, output_layer, out_sign, pr);
        error = tres2.0;
        error_sign = tres2.1;
        (field[ac][fe], field[ac], field[ac][fe], field[ac]) tres3 = backward_propagation_layer(w, b, sample, error, learning_rate, pr, w_sign, b_sign, sample_sign, error_sign);
        w = tres3.0;
        b = tres3.1;
        w_sign = tres3.2;
        b_sign = tres3.3;
    }}

    // Calculate res as the number of elements that are unchanged between b and b_new and w and w_new.
    field mut res = 0;
    for u32 i in 0..ac {{
        res = res + (if b[i] == b_new[i] {{ 1 }} else {{ 0 }});
    }}
    for u32 j in 0..fe {{
        for u32 i in 0..ac {{
            res = res + (if w[i][j] == w_new[i][j] {{ 1 }} else {{ 0 }});
        }}
    }}
    // This assertion expects that all ac biases and all ac*fe weights remain equal.
    // If training is supposed to update these values, then you might need to remove or modify this assertion.
    // assert(res == u32_to_field(ac + fe * ac));

    field[64] round_constants = [
        42, 43, 170, 2209, 16426, 78087, 279978, 823517, 2097194, 4782931,
        10000042, 19487209, 35831850, 62748495, 105413546, 170859333,
        268435498, 410338651, 612220074, 893871697, 1280000042, 1801088567,
        2494357930, 3404825421, 4586471466, 6103515587, 8031810218, 10460353177,
        13492928554, 17249876351, 21870000042, 27512614133, 34359738410,
        42618442955, 52523350186, 64339296833, 78364164138, 94931877159,
        114415582634, 137231006717, 163840000042, 194754273907, 230539333290,
        271818611081, 319277809706, 373669453167, 435817657258, 506623120485,
        587068342314, 678223072891, 781250000042, 897410677873, 1028071702570,
        1174711139799, 1338925210026, 1522435234413, 1727094849578,
        1954897493219, 2207984167594, 2488651484857, 2799360000042,
        3142742835999, 3521614606250, 3938980639125
    ];

    field mut gobal_hash_check = mimc_hash(w, b, round_constants);
    field mut is_current_hash_found = if sc_global_model_hash == gobal_hash_check {{ 1 }} else {{ 0 }};

    field mut result = if mimc_hash(w_new, b_new, round_constants) == ldigest {{ 1 }} else {{ 0 }};
    return result == 1 && is_current_hash_found == 1;
}}
'''

_AGGREGATOR_TEMPLATE = r'''import "utils/casts/field_to_u32" as field_to_u32;
import "utils/casts/u32_to_field" as u32_to_field;
import "utils/casts/field_to_u64" as field_to_u64;
import "utils/casts/u64_to_field" as u64_to_field;

const field max = 0-1;
const field threshold = 20888242871839275222246405745257275088548364400416034343698204186575808495617;
const u32  fe = {fe};
const u32  ac = {ac};
const field ac_f={ac};
const u32 c = {c}; 


def add(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign==0 {{ a }} else {{ max-a+1}};
    field mut b_cleansed = if b_sign==0  {{b}} else {{max-b+1}};
    field mut c = if a_sign == b_sign && a_sign == 1 {{(max+1-a_cleansed-b_cleansed)}} else {{a+b}};
    field mut c_sign = if c > threshold {{1}} else {{0}} ;
    return (c, c_sign);
}}


def subtract(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign==0 {{a}} else {{max-a+1}} ;
    field mut b_cleansed = if b_sign==0 {{b}} else {{max-b+1}} ;
    field mut c = if a_sign != b_sign && a_sign==0 {{a_cleansed+b_cleansed}} else {{a-b}} ;
    field mut d = if c > threshold {{1}} else {{0}} ;
    return (c, d);
}}

def divide(field mut a, field mut b, field mut a_sign, field mut b_sign) -> (field, field) {{
    field mut a_cleansed = if a_sign==0 {{a}} else {{max-a+1}};
    field mut b_cleansed = if b_sign==0 {{b}} else {{max-b+1}};
    u64 a_u64 =field_to_u64(a_cleansed);
    u64 b_u64 = field_to_u64(b_cleansed);
    u64 remainder = a_u64%b_u64;
    // Adjust the numerator to ensure it's divisible by the denominator
    a_cleansed = u64_to_field(a_u64-remainder);
    field mut res = a_cleansed/b_cleansed;
    // Determine the sign of the result
    field mut sign = if a_sign==b_sign || res==0 {{0}} else {{1}};
    res = if sign == 0 {{res}} else {{max+1-res}};
    return (res, sign);
}}

// Function to update global weights and biases
def update_global(
    field[ac][fe] mut global_w, 
    field[ac][fe] mut global_w_sign,
    field[ac] mut global_b, 
    field[ac] mut global_b_sign,
    field[c][ac][fe] local_w, 
    field[c][ac][fe] mut local_w_sign,
    field[c][ac] local_b, 
    field[c][ac] mut local_b_sign
) -> (field[ac][fe], field[ac], field[ac][fe], field[ac]) {{
    
    // Initialize the new global parameters
    field[ac][fe] mut new_global_w = [[0; fe]; ac];
    field[ac] mut new_global_b = [0; ac];
    field[ac][fe] mut new_global_w_sign = [[0; fe]; ac];
    field[ac] mut new_global_b_sign = [0; ac];
    field k_field = u32_to_field(c); // Convert k to field type

    // Iterate over each client
    for u32 client in 0..c {{
        // Update global weights for each client
        for u32 i in 0..ac {{
            for u32 j in 0..fe {{
                (field, field) tres = subtract(local_w[client][i][j], global_w[i][j], local_w_sign[client][i][j], global_w_sign[i][j]);
                field mut temp = tres.0;
                field mut temp_sign = tres.1;
                
                (field, field) tres2 = divide(temp, k_field, temp_sign, 0);
                temp = tres2.0;
                temp_sign = tres2.1;
                
                (field, field) tres3 = add(global_w[i][j], temp, global_w_sign[i][j], temp_sign);
                new_global_w[i][j] = tres3.0;
                new_global_w_sign[i][j] = tres3.1;
            }}
        }}

        // Update global biases for each client
        for u32 i in 0..ac {{
            (field, field) tres = subtract(local_b[client][i], global_b[i], local_b_sign[client][i], global_b_sign[i]);
            field mut temp = tres.0;
            field mut temp_sign = tres.1;
            
            (field, field) tres2 = divide(temp, k_field, temp_sign, 0);
            temp = tres2.0;
            temp_sign = tres2.1;
            
            (field, field) tres3 = add(global_b[i], temp, global_b_sign[i], temp_sign);
            new_global_b[i] = tres3.0;
            new_global_b_sign[i] = tres3.1;
        }}
    }}

    return (new_global_w, new_global_b, new_global_w_sign, new_global_b_sign);
}}
    
// we should check if aggregator used those verified model or not
def local_hash_contains(field[c] sc_lhashes, field[c] local_params_hash) -> field {{
    field mut is_current_hash_found = 1;// Assume all hashes match initially
    for u32 i in 0..c {{
        for u32 j in 0..c {{
            // Update 'found' if a match is found, but don't revert if a match was found earlier
            is_current_hash_found = if sc_lhashes[i] == local_params_hash[j] {{ is_current_hash_found }} else {{0}};
        }}
    }}
    return is_current_hash_found; // Return 1 if all matches found, 0 otherwise
}}

def mimc_cipher(field mut input, field[64] mut round_constants, field mut z) -> field{{
  
  field mut a = 0;
  
  for u32 i in 0..64 {{
    a = input + round_constants[i] + z;
    input = a ** 7;
  }}
   return (input + z);
}}

def mimc_hash(field[ac][fe] mut w, field[ac] mut b, field[64] mut round_constants) -> field {{
    field mut z = 0;

    // Iterate over the activations/layers
    for u32 i in 0..ac {{
        // Iterate over the features/weights per activation
        for u32 j in 0..fe {{
            z = mimc_cipher(w[i][j], round_constants, z);
        }}
        // Process the bias for each activation/layer
        z = mimc_cipher(b[i], round_constants, z);
    }}

    return z;
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
    
    field[ac][fe] mut computed_global_w = [[0; fe]; ac];
    field[ac][fe] mut computed_global_w_sign = [[0; fe]; ac];
    field[ac] mut computed_global_b = [0; ac];
    field[ac] mut computed_global_b_sign = [0; ac];
    bool mut is_correct = true;

    field[c] mut local_hash_check = [0; c];

    // Compute updated global weights and biases
    (field[ac][fe], field[ac], field[ac][fe], field[ac]) tres = update_global(
        global_w, global_w_sign, global_b, global_b_sign,
        local_w, local_w_sign, local_b, local_b_sign
    );
    computed_global_w = tres.0;
    computed_global_b = tres.1;
    computed_global_w_sign = tres.2;
    computed_global_b_sign = tres.3;

    // Check if computed values match the expected values
    for u32 i in 0..ac {{
        for u32 j in 0..fe {{
            is_correct = if (is_correct) && (computed_global_w[i][j] != expected_global_w[i][j]) && (computed_global_w_sign[i][j] != expected_global_w_sign[i][j]) {{false}} else {{true}};
        }}
        is_correct = if (is_correct) && (computed_global_b[i] != expected_global_b[i]) && (computed_global_b_sign[i] != expected_global_b_sign[i]) {{false}} else {{true}};
    }}
    
    assert (is_correct == true || is_correct == false); 

    field[64] round_constants = [
        42, 43, 170, 2209, 16426, 78087, 279978, 823517, 2097194, 4782931,
        10000042, 19487209, 35831850, 62748495, 105413546, 170859333,
        268435498, 410338651, 612220074, 893871697, 1280000042, 1801088567,
        2494357930, 3404825421, 4586471466, 6103515587, 8031810218, 10460353177,
        13492928554, 17249876351, 21870000042, 27512614133, 34359738410,
        42618442955, 52523350186, 64339296833, 78364164138, 94931877159,
        114415582634, 137231006717, 163840000042, 194754273907, 230539333290,
        271818611081, 319277809706, 373669453167, 435817657258, 506623120485,
        587068342314, 678223072891, 781250000042, 897410677873, 1028071702570,
        1174711139799, 1338925210026, 1522435234413, 1727094849578,
        1954897493219, 2207984167594, 2488651484857, 2799360000042,
        3142742835999, 3521614606250, 3938980639125
    ];
   
    for u32 i in 0..c {{
        // Calculate hash for each client's weights and biases
        local_hash_check[i] = mimc_hash(local_w[i], local_b[i], round_constants);
    }}

    field lhashes_match = local_hash_contains(sc_lhashes, local_hash_check);
     assert(lhashes_match==1);  

    
    field mut result = if mimc_hash(computed_global_w, computed_global_b, round_constants) == gdigest {{1}} else {{0}};
    return result == 1;

}}'''


def training_circuit(fe: int = 9, ac: int = 6, bs: int = 20) -> str:
    """Client training circuit (`root.zok`), dims parameterized."""
    return _TRAINING_TEMPLATE.format(fe=fe, ac=ac, bs=bs)


def aggregator_circuit(fe: int = 9, ac: int = 6, c: int = 8) -> str:
    """Aggregator circuit (`aggregator/root.zok`), dims parameterized."""
    return _AGGREGATOR_TEMPLATE.format(fe=fe, ac=ac, c=c)


def write_circuits(out_dir: str, fe: int = 9, ac: int = 6, bs: int = 20,
                   c: int = 8) -> dict:
    """Emit both circuits into `out_dir` (training root.zok at the top
    level, aggregator under aggregator/), mirroring the reference layout.
    Returns {name: path}."""
    import os

    os.makedirs(os.path.join(out_dir, "aggregator"), exist_ok=True)
    paths = {}
    p = os.path.join(out_dir, "root.zok")
    with open(p, "w") as f:
        f.write(training_circuit(fe, ac, bs))
    paths["training"] = p
    p = os.path.join(out_dir, "aggregator", "root.zok")
    with open(p, "w") as f:
        f.write(aggregator_circuit(fe, ac, c))
    paths["aggregator"] = p
    return paths

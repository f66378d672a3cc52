/* C API smoke test (the analog of the reference c_api_tests C programs): keygen, encrypt,
 * compute, decrypt, serialize round-trip — pure C, error codes checked. */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "tfhe_tpu.h"

#define CHECK(expr)                                                        \
    do {                                                                   \
        int _rc = (expr);                                                  \
        if (_rc != 0) {                                                    \
            fprintf(stderr, "FAIL %s -> %d: %s\n", #expr, _rc,             \
                    tfhe_tpu_last_error());                                \
            return 1;                                                      \
        }                                                                  \
    } while (0)

int main(void) {
    CHECK(tfhe_tpu_init());

    TfheClientKey *ck = NULL;
    TfheServerKey *sk = NULL;
    CHECK(tfhe_tpu_generate_keys("PARAM_TEST_TOY", 42, &ck, &sk));
    CHECK(tfhe_tpu_set_server_key(sk));

    TfheFheUint *a = NULL, *b = NULL;
    CHECK(tfhe_tpu_fheuint_encrypt(8, 27, ck, &a));
    CHECK(tfhe_tpu_fheuint_encrypt(8, 15, ck, &b));

    uint64_t clear = 0;

    TfheFheUint *sum = NULL;
    CHECK(tfhe_tpu_fheuint_add(a, b, &sum));
    CHECK(tfhe_tpu_fheuint_decrypt(sum, ck, &clear));
    if (clear != 42) { fprintf(stderr, "add: got %llu want 42\n",
                               (unsigned long long)clear); return 1; }

    TfheFheUint *band = NULL;
    CHECK(tfhe_tpu_fheuint_bitand(a, b, &band));
    CHECK(tfhe_tpu_fheuint_decrypt(band, ck, &clear));
    if (clear != (27 & 15)) { fprintf(stderr, "bitand: got %llu\n",
                                      (unsigned long long)clear); return 1; }

    TfheFheUint *smul = NULL;
    CHECK(tfhe_tpu_fheuint_scalar_mul(a, 3, &smul));
    CHECK(tfhe_tpu_fheuint_decrypt(smul, ck, &clear));
    if (clear != (27ull * 3) % 256) { fprintf(stderr, "smul wrong\n"); return 1; }

    /* round-2 surface: comparisons, min/max, scalar shifts, unary */
    TfheFheUint *ge = NULL, *mx = NULL, *shl = NULL, *inv = NULL;
    CHECK(tfhe_tpu_fheuint_ge(a, b, &ge));
    CHECK(tfhe_tpu_fheuint_decrypt(ge, ck, &clear));
    if (clear != 1) { fprintf(stderr, "ge wrong\n"); return 1; }
    CHECK(tfhe_tpu_fheuint_max(a, b, &mx));
    CHECK(tfhe_tpu_fheuint_decrypt(mx, ck, &clear));
    if (clear != 27) { fprintf(stderr, "max wrong\n"); return 1; }
    CHECK(tfhe_tpu_fheuint_scalar_shl(b, 2, &shl));
    CHECK(tfhe_tpu_fheuint_decrypt(shl, ck, &clear));
    if (clear != (15ull << 2)) { fprintf(stderr, "shl wrong\n"); return 1; }
    CHECK(tfhe_tpu_fheuint_not(b, &inv));
    CHECK(tfhe_tpu_fheuint_decrypt(inv, ck, &clear));
    if (clear != (~15ull & 0xff)) { fprintf(stderr, "not wrong\n"); return 1; }
    tfhe_tpu_fheuint_destroy(ge);
    tfhe_tpu_fheuint_destroy(mx);
    tfhe_tpu_fheuint_destroy(shl);
    tfhe_tpu_fheuint_destroy(inv);

    /* serialization round trip */
    uint8_t *buf = NULL;
    size_t len = 0;
    CHECK(tfhe_tpu_fheuint_serialize(sum, &buf, &len));
    TfheFheUint *back = NULL;
    CHECK(tfhe_tpu_fheuint_deserialize(buf, len, &back));
    CHECK(tfhe_tpu_fheuint_decrypt(back, ck, &clear));
    if (clear != 42) { fprintf(stderr, "roundtrip: got %llu\n",
                               (unsigned long long)clear); return 1; }
    tfhe_tpu_buffer_destroy(buf, len);

    tfhe_tpu_fheuint_destroy(a);
    tfhe_tpu_fheuint_destroy(b);
    tfhe_tpu_fheuint_destroy(sum);
    tfhe_tpu_fheuint_destroy(band);
    tfhe_tpu_fheuint_destroy(smul);
    tfhe_tpu_fheuint_destroy(back);
    tfhe_tpu_client_key_destroy(ck);
    tfhe_tpu_server_key_destroy(sk);

    printf("c_api_test OK\n");
    return 0;
}

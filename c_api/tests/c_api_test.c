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
    if (clear != (27 * 3) % 256) { fprintf(stderr, "scalar_mul: got %llu\n",
                                           (unsigned long long)clear); return 1; }

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

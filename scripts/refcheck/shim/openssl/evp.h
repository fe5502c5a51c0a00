/* Minimal OpenSSL EVP shim: AES-256-ECB encrypt-only, the single cipher
 * the reference's PRF (lib/util/crypto.h) uses. */
#ifndef REFCHECK_SHIM_OPENSSL_EVP_H_
#define REFCHECK_SHIM_OPENSSL_EVP_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct evp_cipher_ctx_st EVP_CIPHER_CTX;
typedef struct evp_cipher_st EVP_CIPHER;
typedef struct engine_st ENGINE;

EVP_CIPHER_CTX *EVP_CIPHER_CTX_new(void);
void EVP_CIPHER_CTX_free(EVP_CIPHER_CTX *ctx);
const EVP_CIPHER *EVP_aes_256_ecb(void);
int EVP_EncryptInit_ex(EVP_CIPHER_CTX *ctx, const EVP_CIPHER *type,
                       ENGINE *impl, const unsigned char *key,
                       const unsigned char *iv);
int EVP_EncryptUpdate(EVP_CIPHER_CTX *ctx, unsigned char *out, int *outl,
                      const unsigned char *in, int inl);

#ifdef __cplusplus
}
#endif

#endif /* REFCHECK_SHIM_OPENSSL_EVP_H_ */

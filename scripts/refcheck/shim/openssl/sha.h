/* Minimal OpenSSL-compatible SHA-256 shim for building the reference
 * library in this image (which has no OpenSSL dev headers).
 *
 * Only the symbols used by the reference's lib/util/crypto.h are
 * provided.  The implementation (shim.c) is our own FIPS 180-4
 * SHA-256, the same core as longfellow_zk_tpu/native/lfzk_native.c.
 */
#ifndef REFCHECK_SHIM_OPENSSL_SHA_H_
#define REFCHECK_SHIM_OPENSSL_SHA_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SHA256_DIGEST_LENGTH 32

/* Plain POD so the reference's SHA256::CopyState (struct assignment)
 * works. */
typedef struct {
  uint32_t h[8];
  uint64_t count; /* total bytes absorbed */
  uint8_t buf[64];
} SHA256_CTX;

int SHA256_Init(SHA256_CTX *c);
int SHA256_Update(SHA256_CTX *c, const void *data, size_t len);
int SHA256_Final(unsigned char *md, SHA256_CTX *c);

#ifdef __cplusplus
}
#endif

#endif /* REFCHECK_SHIM_OPENSSL_SHA_H_ */

/* OpenSSL rand.h shim: RAND_bytes backed by getrandom(2)//dev/urandom. */
#ifndef REFCHECK_SHIM_OPENSSL_RAND_H_
#define REFCHECK_SHIM_OPENSSL_RAND_H_

#ifdef __cplusplus
extern "C" {
#endif

int RAND_bytes(unsigned char *buf, int num);

#ifdef __cplusplus
}
#endif

#endif /* REFCHECK_SHIM_OPENSSL_RAND_H_ */

/* OpenSSL aes.h shim: the reference includes it but only uses the EVP
 * interface; nothing beyond the block-size constant is needed. */
#ifndef REFCHECK_SHIM_OPENSSL_AES_H_
#define REFCHECK_SHIM_OPENSSL_AES_H_

#define AES_BLOCK_SIZE 16

#endif /* REFCHECK_SHIM_OPENSSL_AES_H_ */

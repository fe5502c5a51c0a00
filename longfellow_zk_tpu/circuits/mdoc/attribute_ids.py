"""mdoc attribute-id registry.

Interop configuration data (semantic twin of reference
lib/circuits/mdoc/mdoc_attribute_ids.h:27-308): the namespaces, doc
types, and attribute identifiers a verifier may request.  Like the
zk_spec table this is protocol constants shared across implementations,
sourced from the ISO 18013-5 / AAMVA / EUDI / ISO 23220 / EU AV /
Aadhaar specifications.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

MDL_NAMESPACE = "org.iso.18013.5.1"
AAMVA_NAMESPACE = "org.iso.18013.5.1.aamva"
EUAV_NAMESPACE = "eu.europa.ec.av.1"
EUDI_PID_NAMESPACE = "eu.europa.ec.eudi.pid.1"
ISO23220_NAMESPACE = "org.iso.23220.1"
ISO23220_PHOTOID_NAMESPACE = "org.iso.23220.photoID.1"
ISO23220_DTC_NAMESPACE = "org.iso.23220.dtc.1"
AADHAAR_NAMESPACE = "in.gov.uidai.aadhaar.1"

SUPPORTED_NAMESPACES: Tuple[str, ...] = (
    MDL_NAMESPACE, AAMVA_NAMESPACE, EUAV_NAMESPACE, EUDI_PID_NAMESPACE,
    ISO23220_NAMESPACE, ISO23220_PHOTOID_NAMESPACE, ISO23220_DTC_NAMESPACE,
    AADHAAR_NAMESPACE)

IDPASS_DOC_TYPE = "com.google.wallet.idcard.1"
MDL_DOC_TYPE = "org.iso.18013.5.1.mDL"
EUAV_DOC_TYPE = "eu.europa.ec.av.1"
EUDI_PID_DOC_TYPE = "eu.europa.ec.eudi.pid.1"
ISO23220_PHOTOID_DOC_TYPE = "org.iso.23220.photoID.1"
AADHAAR_DOC_TYPE = "in.gov.uidai.aadhaar.1"

_MDL = [
    "family_name", "given_name", "birth_date", "issue_date", "expiry_date",
    "issuing_country", "issuing_authority", "document_number", "portrait",
    "driving_privileges", "un_distinguishing_sign", "administrative_number",
    "sex", "height", "weight", "eye_colour", "hair_colour", "birth_place",
    "resident_address", "portrait_capture_date", "age_in_years",
    "age_birth_year",
    *("age_over_%d" % n for n in (10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                                  20, 21, 23, 25, 50, 55, 60, 65, 70, 75)),
    "issuing_jurisdiction", "nationality", "resident_city", "resident_state",
    "resident_postal_code", "resident_country",
    *("biometric_template_%s" % t for t in (
        "face", "voice", "finger", "iris", "retina", "hand_geometry",
        "keystroke", "signature_sign", "lip_movement", "thermal_face",
        "thermal_hand", "gait", "body_odor", "dna", "ear",
        "finger_geometry", "palm_geometry", "vein_pattern", "foot_print")),
    "family_name_national_character", "given_name_national_character",
    "signature_usual_mark",
]

_AAMVA = [
    "name_suffix", "organ_donor", "veteran", "family_name_truncation",
    "given_name_truncation", "aka_family_name.v2", "aka_given_name.v2",
    "aka_suffix", "weight_range", "race_ethnicity", "sex", "first_name",
    "middle_names", "first_name_truncation", "middle_names_truncation",
    "EDL_credential", "EDL_credential.v2", "DHS_compliance",
    "resident_county", "resident_county.v2",
    "hazmat_endorsement_expiration_date", "CDL_indicator",
    "CDL_non_domiciled", "CDL_non_domiciled.v2", "DHS_compliance_text",
    "DHS_temporary_lawful_status",
]

_EUDI_PID = [
    "family_name", "given_name", "birth_date", "age_in_years",
    "age_birth_year", "age_equal_or_over", "age_over_18", "age_over_21",
    "family_name_birth", "given_name_birth", "birth_place",
    "place_of_birth", "birth_country", "birth_state", "birth_city",
    "address", "resident_address", "resident_country", "resident_state",
    "resident_city", "resident_postal_code", "resident_street",
    "resident_house_number", "sex", "nationality", "issuance_date",
    "expiry_date", "issuing_authority", "document_number",
    "personal_administrative_number", "issuing_jurisdiction",
    "issuing_country", "portrait", "email_address", "mobile_phone_number",
]

_ISO23220 = [
    "family_name_unicode", "given_name_unicode", "birth_date", "portrait",
    "issue_date", "expiry_date", "issuing_authority_unicode",
    "issuing_country", "age_in_years",
    *("age_over_%d" % n for n in (13, 16, 18, 21, 25, 60, 62, 65, 68)),
    "age_birth_year", "portrait_capture_date", "birthplace",
    "name_at_birth", "resident_address_unicode", "resident_city_unicode",
    "resident_postal_code", "resident_country", "resident_city_latin1",
    "sex", "nationality", "document_number", "issuing_subdivision",
    "family_name_latin1", "given_name_latin1",
]

_ISO23220_PHOTOID = [
    "person_id", "birth_country", "birth_state", "birth_city",
    "administrative_number", "resident_street", "resident_house_number",
    "travel_document_number", "resident_state",
]

_ISO23220_DTC = [
    "dtc_version", "dtc_sod",
    *("dtc_dg%d" % n for n in range(1, 17)),
    "dg_content_info",
]

_EUAV = [
    *("age_over_%d" % n for n in (18, 13, 15, 16, 21, 23, 25, 27, 28, 40,
                                  60, 65, 67)),
    "portrait",
]

_AADHAAR = [
    "credential_issuing_date", "enrolment_date", "enrolment_number",
    "is_nri", "resident_image", "resident_name", "local_resident_name",
    "age_above18", "age_above60", "age_above75", "dob", "gender",
    "building", "local_building", "locality", "local_locality", "street",
    "local_street", "landmark", "local_landmark", "vtc", "local_vtc",
    "sub_district", "local_sub_district", "district", "local_district",
    "state", "local_state", "po_name", "local_po_name", "pincode",
    "address", "local_address", "mobile", "masked_mobile", "email",
    "masked_email", "masked_uid", "aadhaar_type", "expires_on",
]

MDOC_ATTRIBUTES: Tuple[Tuple[str, str], ...] = tuple(
    (ident, ns) for ns, idents in (
        (MDL_NAMESPACE, _MDL),
        (AAMVA_NAMESPACE, _AAMVA),
        (EUDI_PID_NAMESPACE, _EUDI_PID),
        (ISO23220_NAMESPACE, _ISO23220),
        (ISO23220_PHOTOID_NAMESPACE, _ISO23220_PHOTOID),
        (ISO23220_DTC_NAMESPACE, _ISO23220_DTC),
        (EUAV_NAMESPACE, _EUAV),
        (AADHAAR_NAMESPACE, _AADHAAR),
    ) for ident in idents)

_BY_NAMESPACE: Dict[str, List[str]] = {}
for _ident, _ns in MDOC_ATTRIBUTES:
    _BY_NAMESPACE.setdefault(_ns, []).append(_ident)


def is_supported_namespace(ns: str) -> bool:
    return ns in SUPPORTED_NAMESPACES


def is_known_attribute(identifier: str, namespace: Optional[str] = None
                       ) -> bool:
    """True if (identifier, namespace) appears in the registry; with no
    namespace, true if any namespace defines the identifier."""
    if namespace is not None:
        return identifier in _BY_NAMESPACE.get(namespace, ())
    return any(identifier in ids for ids in _BY_NAMESPACE.values())


def attributes_in_namespace(ns: str) -> Tuple[str, ...]:
    return tuple(_BY_NAMESPACE.get(ns, ()))

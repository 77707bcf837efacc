"""Lovins (1968) stemmer data: ending->condition tables and the
transformation rules — public algorithm data (J.B. Lovins,
"Development of a Stemming Algorithm", MT 1968)."""

ENDINGS = {
    11: {
        'alistically': 'B', 'arizability': 'A', 'izationally': 'B',
    },
    10: {
        'antialness': 'A', 'arisations': 'A', 'arizations': 'A',
        'entialness': 'A',
    },
    9: {
        'allically': 'C', 'antaneous': 'A', 'antiality': 'A',
        'arisation': 'A', 'arization': 'A', 'ationally': 'B',
        'ativeness': 'A', 'eableness': 'E', 'entations': 'A',
        'entiality': 'A', 'entialize': 'A', 'entiation': 'A',
        'ionalness': 'A', 'istically': 'A', 'itousness': 'A',
        'izability': 'A', 'izational': 'A',
    },
    8: {
        'ableness': 'A', 'arizable': 'A', 'entation': 'A', 'entially':
        'A', 'eousness': 'A', 'ibleness': 'A', 'icalness': 'A',
        'ionalism': 'A', 'ionality': 'A', 'ionalize': 'A', 'iousness':
        'A', 'izations': 'A', 'lessness': 'A',
    },
    7: {
        'ability': 'A', 'aically': 'A', 'alistic': 'B', 'alities': 'A',
        'ariness': 'E', 'aristic': 'A', 'arizing': 'A', 'ateness': 'A',
        'atingly': 'A', 'ational': 'B', 'atively': 'A', 'ativism': 'A',
        'elihood': 'E', 'encible': 'A', 'entally': 'A', 'entials': 'A',
        'entiate': 'A', 'entness': 'A', 'fulness': 'A', 'ibility': 'A',
        'icalism': 'A', 'icalist': 'A', 'icality': 'A', 'icalize': 'A',
        'ication': 'G', 'icianry': 'A', 'ination': 'A', 'ingness': 'A',
        'ionally': 'A', 'isation': 'A', 'ishness': 'A', 'istical': 'A',
        'iteness': 'A', 'iveness': 'A', 'ivistic': 'A', 'ivities': 'A',
        'ization': 'F', 'izement': 'A', 'oidally': 'A', 'ousness': 'A',
    },
    6: {
        'aceous': 'A', 'acious': 'B', 'action': 'G', 'alness': 'A',
        'ancial': 'A', 'ancies': 'A', 'ancing': 'B', 'ariser': 'A',
        'arized': 'A', 'arizer': 'A', 'atable': 'A', 'ations': 'B',
        'atives': 'A', 'eature': 'Z', 'efully': 'A', 'encies': 'A',
        'encing': 'A', 'ential': 'A', 'enting': 'C', 'entist': 'A',
        'eously': 'A', 'ialist': 'A', 'iality': 'A', 'ialize': 'A',
        'ically': 'A', 'icance': 'A', 'icians': 'A', 'icists': 'A',
        'ifully': 'A', 'ionals': 'A', 'ionate': 'D', 'ioning': 'A',
        'ionist': 'A', 'iously': 'A', 'istics': 'A', 'izable': 'E',
        'lessly': 'A', 'nesses': 'A', 'oidism': 'A',
    },
    5: {
        'acies': 'A', 'acity': 'A', 'aging': 'B', 'aical': 'A', 'alism':
        'B', 'alist': 'A', 'ality': 'A', 'alize': 'A', 'allic': 'b',
        'anced': 'B', 'ances': 'B', 'antic': 'C', 'arial': 'A', 'aries':
        'A', 'arily': 'A', 'arity': 'B', 'arize': 'A', 'aroid': 'A',
        'ately': 'A', 'ating': 'I', 'ation': 'B', 'ative': 'A', 'ators':
        'A', 'atory': 'A', 'ature': 'E', 'early': 'Y', 'ehood': 'A',
        'eless': 'A', 'elily': 'A', 'ement': 'A', 'enced': 'A', 'ences':
        'A', 'eness': 'E', 'ening': 'E', 'ental': 'A', 'ented': 'C',
        'ently': 'A', 'fully': 'A', 'ially': 'A', 'icant': 'A', 'ician':
        'A', 'icide': 'A', 'icism': 'A', 'icist': 'A', 'icity': 'A',
        'idine': 'I', 'iedly': 'A', 'ihood': 'A', 'inate': 'A', 'iness':
        'A', 'ingly': 'B', 'inism': 'J', 'inity': 'c', 'ional': 'A',
        'ioned': 'A', 'ished': 'A', 'istic': 'A', 'ities': 'A', 'itous':
        'A', 'ively': 'A', 'ivity': 'A', 'izers': 'F', 'izing': 'F',
        'oidal': 'A', 'oides': 'A', 'otide': 'A', 'ously': 'A',
    },
    4: {
        'able': 'A', 'ably': 'A', 'ages': 'B', 'ally': 'B', 'ance': 'B',
        'ancy': 'B', 'ants': 'B', 'aric': 'A', 'arly': 'K', 'ated': 'I',
        'ates': 'A', 'atic': 'B', 'ator': 'A', 'ealy': 'Y', 'edly': 'E',
        'eful': 'A', 'eity': 'A', 'ence': 'A', 'ency': 'A', 'ened': 'E',
        'enly': 'E', 'eous': 'A', 'hood': 'A', 'ials': 'A', 'ians': 'A',
        'ible': 'A', 'ibly': 'A', 'ical': 'A', 'ides': 'L', 'iers': 'A',
        'iful': 'A', 'ines': 'M', 'ings': 'N', 'ions': 'B', 'ious': 'A',
        'isms': 'B', 'ists': 'A', 'itic': 'H', 'ized': 'F', 'izer': 'F',
        'less': 'A', 'lily': 'A', 'ness': 'A', 'ogen': 'A', 'ward': 'A',
        'wise': 'A', 'ying': 'B', 'yish': 'A',
    },
    3: {
        'acy': 'A', 'age': 'B', 'aic': 'A', 'als': 'b', 'ant': 'B',
        'ars': 'O', 'ary': 'F', 'ata': 'A', 'ate': 'A', 'eal': 'Y',
        'ear': 'Y', 'ely': 'E', 'ene': 'E', 'ent': 'C', 'ery': 'E',
        'ese': 'A', 'ful': 'A', 'ial': 'A', 'ian': 'A', 'ics': 'A',
        'ide': 'L', 'ied': 'A', 'ier': 'A', 'ies': 'P', 'ily': 'A',
        'ine': 'M', 'ing': 'N', 'ion': 'Q', 'ish': 'C', 'ism': 'B',
        'ist': 'A', 'ite': 'a', 'ity': 'A', 'ium': 'A', 'ive': 'A',
        'ize': 'F', 'oid': 'A', 'one': 'R', 'ous': 'A',
    },
    2: {
        "'s": 'A', 'ae': 'A', 'al': 'b', 'ar': 'X', 'as': 'B', 'ed':
        'E', 'en': 'F', 'es': 'E', 'ia': 'A', 'ic': 'A', 'is': 'A',
        'ly': 'B', 'on': 'S', 'or': 'T', "s'": 'A', 'um': 'U', 'us':
        'V', 'yl': 'R',
    },
    1: {
        'a': 'A', 'e': 'A', 'i': 'A', 'o': 'A', 's': 'W', 'y': 'B',
    },
}

TRANSFORMS = (
    ('iev', 'ief'), ('uct', 'uc'), ('iev', 'ief'), ('uct', 'uc'),
    ('umpt', 'um'), ('rpt', 'rb'), ('urs', 'ur'), ('istr', 'ister'),
    ('metr', 'meter'), ('olv', 'olut'), ('ul', 'l', 'aoi'), ('bex',
    'bic'), ('dex', 'dic'), ('pex', 'pic'), ('tex', 'tic'), ('ax',
    'ac'), ('ex', 'ec'), ('ix', 'ic'), ('lux', 'luc'), ('uad', 'uas'),
    ('vad', 'vas'), ('cid', 'cis'), ('lid', 'lis'), ('erid', 'eris'),
    ('pand', 'pans'), ('end', 'ens', 's'), ('ond', 'ons'), ('lud',
    'lus'), ('rud', 'rus'), ('her', 'hes', 'pt'), ('mit', 'mis'),
    ('ent', 'ens', 'm'), ('ert', 'ers'), ('et', 'es', 'n'), ('yt',
    'ys'), ('yz', 'ys'),
)

"""Embedded, frozen seed corpora for the hashed char-n-gram models.

The reference pipeline family uses fastText lid.176 for language ID and a
KenLM-style n-gram LM for perplexity (BASELINE.json north_star). Neither
model artifact is available offline in this sandbox, so we ship a small
deterministic substitute: per-language character-trigram tables built at
import time from the frozen text below. The text is original generic prose
(written for this repo); determinism is the requirement, not linguistic
coverage — the synthetic test corpus is drawn from the same style family.

Do NOT edit casually: the tables derived from these strings define the
reference labels (oracle output) bit-for-bit.
"""

EN = """
the quick brown fox jumps over the lazy dog while the sun sets behind the
hills and the river keeps flowing toward the quiet sea. every morning the
baker opens the shop and the smell of fresh bread drifts across the square.
children walk to school along the old stone road and talk about the games
they will play in the afternoon. the library on the corner keeps a small
collection of maps and letters from a century ago. when the rain comes the
streets empty quickly and people gather under the awnings to wait. a good
cup of tea and a long book make the slow evenings feel shorter. the train
leaves the station at seven and arrives in the city just before nine. we
measured the results carefully and wrote down every number in the ledger.
the committee will meet on tuesday to review the budget and plan the next
quarter. history teaches patience and the garden teaches it twice. please
remember to close the gate so the sheep do not wander onto the road. the
engineer checked the bridge again because the winter had been hard on the
steel. most of the answers were simple once the question was stated well.
"""

FR = """
le petit matin se lève sur la ville et les rues sentent le pain chaud et le
café. les enfants marchent vers l'école en parlant des jeux de l'après-midi.
la bibliothèque du quartier garde une collection de cartes et de lettres du
siècle dernier. quand la pluie arrive les gens s'abritent sous les arcades
et attendent en regardant le ciel. une tasse de thé et un long livre rendent
les soirées plus douces. le train part de la gare à sept heures et arrive en
ville juste avant neuf heures. nous avons mesuré les résultats avec soin et
noté chaque nombre dans le registre. le comité se réunira mardi pour revoir
le budget et préparer le prochain trimestre. l'histoire enseigne la patience
et le jardin l'enseigne deux fois. n'oubliez pas de fermer la barrière pour
que les moutons ne sortent pas sur la route. l'ingénieur a vérifié le pont
encore une fois parce que l'hiver avait été dur pour l'acier. la plupart des
réponses étaient simples une fois la question bien posée.
"""

DE = """
der frühe morgen liegt über der stadt und die straßen riechen nach frischem
brot und kaffee. die kinder gehen zur schule und sprechen über die spiele
des nachmittags. die bibliothek an der ecke bewahrt eine kleine sammlung von
karten und briefen aus dem letzten jahrhundert. wenn der regen kommt leeren
sich die straßen schnell und die leute warten unter den vordächern. eine
tasse tee und ein langes buch machen die langsamen abende kürzer. der zug
verlässt den bahnhof um sieben und kommt kurz vor neun in der stadt an. wir
haben die ergebnisse sorgfältig gemessen und jede zahl in das buch
geschrieben. der ausschuss trifft sich am dienstag um das budget zu prüfen
und das nächste quartal zu planen. die geschichte lehrt geduld und der
garten lehrt sie zweimal. bitte denkt daran das tor zu schließen damit die
schafe nicht auf die straße laufen. der ingenieur prüfte die brücke noch
einmal weil der winter hart für den stahl gewesen war. die meisten antworten
waren einfach sobald die frage gut gestellt war.
"""

ES = """
la mañana temprana cubre la ciudad y las calles huelen a pan recién hecho y
a café. los niños caminan hacia la escuela hablando de los juegos de la
tarde. la biblioteca de la esquina guarda una pequeña colección de mapas y
cartas del siglo pasado. cuando llega la lluvia las calles se vacían rápido
y la gente espera bajo los toldos mirando el cielo. una taza de té y un
libro largo hacen más cortas las tardes lentas. el tren sale de la estación
a las siete y llega a la ciudad justo antes de las nueve. medimos los
resultados con cuidado y anotamos cada número en el registro. el comité se
reunirá el martes para revisar el presupuesto y planear el próximo
trimestre. la historia enseña paciencia y el jardín la enseña dos veces. por
favor recuerden cerrar la puerta para que las ovejas no salgan al camino. el
ingeniero revisó el puente otra vez porque el invierno había sido duro para
el acero. la mayoría de las respuestas eran simples una vez que la pregunta
estaba bien planteada.
"""

IT = """
il primo mattino copre la città e le strade profumano di pane fresco e di
caffè. i bambini camminano verso la scuola parlando dei giochi del
pomeriggio. la biblioteca all'angolo conserva una piccola raccolta di mappe
e lettere del secolo scorso. quando arriva la pioggia le strade si svuotano
in fretta e la gente aspetta sotto i portici guardando il cielo. una tazza
di tè e un libro lungo rendono più brevi le sere lente. il treno parte
dalla stazione alle sette e arriva in città poco prima delle nove. abbiamo
misurato i risultati con cura e annotato ogni numero nel registro. il
comitato si riunirà martedì per rivedere il bilancio e pianificare il
prossimo trimestre. la storia insegna la pazienza e il giardino la insegna
due volte. per favore ricordate di chiudere il cancello perché le pecore
non escano sulla strada. l'ingegnere ha controllato di nuovo il ponte
perché l'inverno era stato duro per l'acciaio. la maggior parte delle
risposte era semplice una volta posta bene la domanda.
"""

PT = """
a manhã cedo cobre a cidade e as ruas cheiram a pão fresco e a café. as
crianças caminham para a escola falando dos jogos da tarde. a biblioteca da
esquina guarda uma pequena coleção de mapas e cartas do século passado.
quando chega a chuva as ruas esvaziam depressa e as pessoas esperam sob os
toldos olhando o céu. uma xícara de chá e um livro longo tornam mais curtas
as tardes lentas. o trem sai da estação às sete e chega à cidade pouco
antes das nove. medimos os resultados com cuidado e anotamos cada número no
registro. o comitê vai se reunir na terça para rever o orçamento e planejar
o próximo trimestre. a história ensina paciência e o jardim a ensina duas
vezes. por favor lembrem de fechar o portão para que as ovelhas não saiam
para a estrada. o engenheiro verificou a ponte outra vez porque o inverno
tinha sido duro para o aço. a maioria das respostas era simples depois que
a pergunta estava bem colocada.
"""

NL = """
de vroege ochtend ligt over de stad en de straten ruiken naar vers brood en
koffie. de kinderen lopen naar school en praten over de spelletjes van de
middag. de bibliotheek op de hoek bewaart een kleine verzameling kaarten en
brieven uit de vorige eeuw. als de regen komt lopen de straten snel leeg en
wachten de mensen onder de luifels naar de lucht te kijken. een kop thee en
een lang boek maken de trage avonden korter. de trein vertrekt om zeven uur
van het station en komt kort voor negen in de stad aan. wij hebben de
resultaten zorgvuldig gemeten en elk getal in het boek geschreven. de
commissie komt dinsdag bijeen om de begroting te bekijken en het volgende
kwartaal te plannen. de geschiedenis leert geduld en de tuin leert het twee
keer. denk eraan het hek te sluiten zodat de schapen niet de weg op lopen.
de ingenieur controleerde de brug nog een keer omdat de winter zwaar was
geweest voor het staal. de meeste antwoorden waren eenvoudig zodra de vraag
goed gesteld was.
"""

SV = """
den tidiga morgonen ligger över staden och gatorna doftar av färskt bröd
och kaffe. barnen går till skolan och pratar om eftermiddagens lekar.
biblioteket i hörnet bevarar en liten samling kartor och brev från förra
århundradet. när regnet kommer tömmer sig gatorna snabbt och folk väntar
under markiserna och tittar på himlen. en kopp te och en lång bok gör de
långsamma kvällarna kortare. tåget lämnar stationen klockan sju och kommer
fram till staden strax före nio. vi mätte resultaten noggrant och skrev ner
varje tal i boken. kommittén träffas på tisdag för att granska budgeten och
planera nästa kvartal. historien lär ut tålamod och trädgården lär ut det
två gånger. kom ihåg att stänga grinden så att fåren inte springer ut på
vägen. ingenjören kontrollerade bron en gång till eftersom vintern hade
varit hård mot stålet. de flesta svaren var enkla när frågan väl var rätt
ställd.
"""

LANG_CORPORA = {
    "en": EN, "fr": FR, "de": DE, "es": ES,
    "it": IT, "pt": PT, "nl": NL, "sv": SV,
}

# English stopword lexicon (broadcast side input; analogue of the
# reference's test/stopwords.txt mechanism, reference
# src/check/dictionary.rs:22-24). Frozen.
STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its of on or she that the their them they this to was were will with "
    "you your we our not no so if then than do does did what which who"
).split()

# Synthetic profanity lexicon (toxicity side input; planted pseudo-words so
# tests contain no real slurs — FIXTURES.md §2).
PROFANITY = ["fraktz", "blorgak", "smegwit", "drekhole"]
